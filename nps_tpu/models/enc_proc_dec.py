"""Encode-Process-Decode composition root + component resolver.

Capability parity with ``src/models/enc_proc_dec.py``:
- ``create_model`` resolves encoder/processor/decoder specs given as a
  module instance / dict / Namespace / dotted string against the component
  registry ``[models.enc_proc_dec_components, models, models.common]``
  (``enc_proc_dec.py:14-38``);
- processors may be a list -> chained, with optional proc->proc residual
  (``:94-98,175-181``);
- forward: null-out empty tensors, embed the conditioning signal
  (``models/base.py:24-73``), broadcast + concat ``spatial_cond``, then
  encoder -> processor chain -> decoder;
- model/data interface derived from the processors (``:107-115``).

The GNN branch (``data_structure='graph'``, deprecated upstream at
``enc_proc_dec.py:140`` but part of the capability surface) consumes a
static-shape :class:`~nps_tpu.common.graph.GridGraph` instead of a
torch_geometric ``Data`` object; conditioning broadcasts by node-batch
gather, positions normalize by domain extent (``:152-163``), and the edge
structure is threaded to every component as kwargs.

TPU design: the public boundary keeps the reference layout
``[b, c, tw, *spatial]``; internally everything is channels-last. The whole
module is a flax.linen Module, so ``model.apply(params, ...)`` is a pure
function ready for jit / scan / grad.
"""

import dataclasses
import inspect
from argparse import Namespace
from functools import reduce
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.utils.attr import getattr_nested
from nps_tpu.utils.broadcast import broadcast_to_grid_last


def _component_registry():
    import nps_tpu.models as models
    import nps_tpu.models.enc_proc_dec_components as components

    return [components, models, models.common]


def _filter_kwargs(cls, kwargs):
    """Drop kwargs the component does not declare (reference components
    absorb extras via **kwargs; linen dataclasses do not)."""
    if dataclasses.is_dataclass(cls):
        names = {f.name for f in dataclasses.fields(cls)}
    else:
        sig = inspect.signature(cls)
        if any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values()):
            return dict(kwargs)
        names = set(sig.parameters)
    return {k: v for k, v in kwargs.items() if k in names}


def resolve_component(model, pde, base_args, extra_kwargs=None):
    """Resolve a component spec to (cls, kwargs); mirrors ``create_model``."""
    if isinstance(model, nn.Module):
        return model, None
    # flax freezes dict/list module fields -> accept any Mapping
    from collections.abc import Mapping

    if isinstance(model, (Mapping, Namespace, str)):
        if isinstance(model, str):
            model_class = model
            model_kwargs = dict(base_args)
        else:
            if isinstance(model, Namespace):
                model = vars(model)
            model = dict(model)
            model_class = model.pop("object")
            model_kwargs = dict(list(base_args.items()) + list(model.items()))
        if extra_kwargs is not None:
            model_kwargs = dict(list(model_kwargs.items()) +
                                list(extra_kwargs.items()))
        for module in _component_registry():
            cls = getattr_nested(module, model_class)
            if cls is not False:
                return cls, dict(model_kwargs, pde=pde)
        raise ValueError(f"Cannot find object {model_class} in the component "
                         f"registry")
    raise ValueError("Model spec must be nn.Module / dict / Namespace / str")


def create_model(model, pde, base_args, extra_kwargs=None, name=None):
    """Instantiate a component from its spec (reference ``create_model``)."""
    cls, kwargs = resolve_component(model, pde, base_args, extra_kwargs)
    if kwargs is None:  # already an instance
        return cls
    kwargs = _filter_kwargs(cls, kwargs)
    if name is not None:
        kwargs["name"] = name
    return cls(**kwargs)


def _spec_class(model, base_args):
    """Resolve just the class of a spec (for interface derivation)."""
    if isinstance(model, nn.Module):
        return type(model)
    cls, _ = resolve_component(model, None, base_args)
    return cls if not isinstance(cls, nn.Module) else type(cls)


class EncProcDec(nn.Module):
    """Composition root. Public layout: u [b, c, tw, *sp] in and out."""

    pde: Any = None
    encoder: Any = None
    processor: Any = None
    decoder: Any = None
    bc_encoder: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    data_structure: str = "grid"
    processor_residual: bool = False
    base_args: Tuple = ()  # extra kwargs forwarded to every component

    def _base_args(self):
        base = dict(self.base_args)
        base["num_c"] = self.num_c
        base["num_spatial_dims"] = self.num_spatial_dims
        base["time_window"] = self.time_window
        base["n_cond"] = self.n_cond
        return base

    @property
    def processor_specs(self):
        p = self.processor
        return list(p) if isinstance(p, (list, tuple)) else [p]

    @property
    def n_cond(self):
        n = self.pde.n_cond_static + self.pde.n_cond_spatial
        if self.bc_encoder is not None:
            n += self._bc_encoder_out()
        return n

    def _bc_encoder_out(self):
        from collections.abc import Mapping

        spec = self.bc_encoder
        if isinstance(spec, nn.Module):
            return spec.n_out
        if isinstance(spec, Namespace):
            spec = vars(spec)
        if isinstance(spec, Mapping) and "bc_encoder_out" in spec:
            return spec["bc_encoder_out"]
        return dict(self.base_args)["bc_encoder_out"]

    @property
    def model_interface(self):
        base = dict(self.base_args)
        mi = [_spec_class(p, base).model_interface for p in self.processor_specs]
        assert mi.count(mi[0]) == len(mi), \
            "Not all processors have the same model interface!"
        return mi[0]

    @property
    def data_interface(self):
        base = dict(self.base_args)
        sets = [set(_spec_class(p, base).data_interface)
                for p in self.processor_specs]
        return reduce(set.intersection, sets)

    @nn.compact
    def __call__(self, u, cond=None, bc=None, pos=None, t_cond=None,
                 spatial_cond=None, grid_meta=None):
        """``grid_meta``: optional STATIC (plain-Python) regular-grid
        structure from :func:`nps_tpu.common.graph.grid_offset_structure`,
        enabling the shifted-grid message-passing fast path in graph
        processors. Must never be traced — pass it only from host code
        that closes over it (the trainer/engine do)."""
        assert self.data_structure in ("grid", "graph")

        def check_none(x):
            return None if (x is None or x.size == 0) else x

        cond = check_none(cond)
        bc = check_none(bc)
        pos = check_none(pos)
        t_cond = check_none(t_cond)
        spatial_cond = check_none(spatial_cond)

        nd = self.num_spatial_dims
        base = self._base_args()

        # ---- conditioning embedding (models/base.py:24-73) ----
        variables = []
        if cond is not None:
            variables.append(cond)  # [b, n_static]
        bc_in = None
        if bc is not None and t_cond is not None:
            bc_in = jnp.concatenate([bc, t_cond], axis=1)
        elif bc is not None:
            bc_in = bc
        elif t_cond is not None:
            bc_in = t_cond
        if bc_in is not None and self.bc_encoder is not None:
            bc_enc = create_model(
                self.bc_encoder, self.pde, base,
                extra_kwargs=dict(bc_encoder_in=self.pde.n_cond_dynamic),
                name="bc_encoder")
            variables.append(bc_enc(bc_in))
        variables = (jnp.concatenate(variables, axis=1)
                     if variables else None)

        extra = {}
        if self.data_structure == "grid":
            sp = u.shape[3:]
            # ---- broadcast conditioning to the grid (channels-last) ----
            if variables is not None:
                vb = broadcast_to_grid_last(variables, sp)
                if spatial_cond is not None:
                    sc_cl = jnp.moveaxis(spatial_cond, 1, -1)  # [b, *sp, ns]
                    vb = jnp.concatenate([vb, sc_cl], axis=-1)
            else:
                vb = (jnp.moveaxis(spatial_cond, 1, -1)
                      if spatial_cond is not None else None)
            u_in = u
            pos_in = pos  # dataset grids are already channels-last [b,*sp,nd]
        else:
            # ---- graph: node-space inputs (enc_proc_dec.py:139-168) ----
            graph = u  # a GridGraph pytree
            if spatial_cond is not None:
                # the reference warns and ignores it (enc_proc_dec.py:151)
                import warnings

                warnings.warn("spatial conditioning is not supported for "
                              "data_structure == 'graph'; ignoring it")
            u_in = graph.nodes  # [N, c, tw]
            # broadcast batch-level conditioning to nodes by gather (:150)
            vb = (variables[graph.batch] if variables is not None else None)
            # normalize node positions by domain extent (:152-163)
            pos_in = graph.pos[:, 1:]  # drop the time column
            assert pos_in.shape[-1] == self.num_spatial_dims, (
                f"graph pos has {pos_in.shape[-1]} spatial dims, model "
                f"expects {self.num_spatial_dims}")  # enc_proc_dec.py:147
            L = self.pde.L
            scale = (jnp.asarray(L, pos_in.dtype) if nd > 1
                     else jnp.asarray([L], pos_in.dtype))
            pos_in = pos_in / scale
            extra = dict(edge_index=graph.edge_index, batch=graph.batch)
            if grid_meta is not None:
                # normalize the constant per-offset position deltas exactly
                # like pos (domain-extent division), host-side so they stay
                # static python floats
                sp_m, offsets, deltas = grid_meta
                Ls = (list(L) if nd > 1 else [L])
                deltas_n = tuple(
                    tuple(float(d) / float(s) for d, s in zip(dd, Ls))
                    for dd in deltas)
                extra["grid_meta"] = (tuple(sp_m), offsets, deltas_n)

        if vb is not None:
            # keep the cond tensor in the compute dtype so concats downstream
            # don't silently promote bf16 activations back to f32
            from nps_tpu.models import config as model_config

            vb = model_config.cast_compute(vb)

        # ---- encode / process / decode ----
        encoder = create_model(self.encoder, self.pde, base, name="encoder")
        h = encoder(u=u_in, variables_broadcast=vb, pos=pos_in, **extra)

        for i, p_spec in enumerate(self.processor_specs):
            proc = create_model(p_spec, self.pde, base, name=f"processor_{i}")
            kwargs = dict(variables_broadcast=vb, pos=pos_in, **extra)
            if "variables" in inspect.signature(proc.__call__).parameters:
                kwargs["variables"] = variables
            h_next = proc(h, **kwargs)
            h = h_next + h if (self.processor_residual and i > 0) else h_next

        decoder = create_model(self.decoder, self.pde, base, name="decoder")
        return decoder(h, u_in, variables=variables, variables_broadcast=vb,
                       pos=pos_in, **extra)


def build_enc_proc_dec(pde, encoder, processor, decoder, bc_encoder=None,
                       num_c=1, num_spatial_dims=1, time_window=25,
                       data_structure="grid", processor_residual=False,
                       **base_args):
    """Factory matching the reference constructor signature
    (``EncProcDec(pde=..., encoder=..., ..., **base_args)``)."""
    return EncProcDec(
        pde=pde, encoder=encoder, processor=processor, decoder=decoder,
        bc_encoder=bc_encoder, num_c=num_c,
        num_spatial_dims=num_spatial_dims, time_window=time_window,
        data_structure=data_structure, processor_residual=processor_residual,
        base_args=tuple(base_args.items()))
