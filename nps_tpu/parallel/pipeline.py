"""Pipeline parallelism: GPipe microbatch streaming over a "pipe" mesh axis.

The reference has no distributed code at all (SURVEY.md §2.6) and pipeline
parallelism was declared a non-goal there ("no model depth to pipeline").
This module closes that row anyway, TPU-natively, because the EncProcDec
processor chain IS a homogeneous stack of stages:

- a single ``UFNO`` processor is ``hidden_blocks`` identical
  (FNO layer + U-Net branch, sum, act) blocks — one stage per block;
- a single ``DilatedResnet`` processor is ``hidden_blocks`` identical
  residual dilation blocks — one stage per block;
- a processor *list* whose specs are all equal (e.g. ``[UFNO]*k``) — one
  stage per processor, honoring ``processor_residual``.

Design (collective pipelining, the shard_map idiom of the scaling book):
stage parameters are stacked on a leading axis and sharded over the
``"pipe"`` mesh axis; inside ``jax.shard_map`` every device runs the SAME
compiled program — a ``lax.scan`` over ``n_micro + n_pipe - 1`` ticks whose
body applies the device's local stage(s) and shifts activations to the next
stage with ``lax.ppermute`` over ICI. Microbatch-indexed context
(conditioning grids, positions) is selected locally by ``t - stage`` — it
never rides the wire. The encoder/decoder and the conditioning-embedding
glue are tiny and run replicated on every pipe rank (redundant compute, zero
communication); only processor activations stream.

Composes with data parallelism on a 2-D ``("data", "pipe")`` mesh: batches
shard over "data", stages over "pipe", and the whole pipelined apply sits
inside the trainer's jitted train/eval steps, so grad all-reduce over "data"
is still GSPMD-inserted. Differentiation goes through scan + ppermute
(both linear), so ``value_and_grad`` of the pipelined step needs nothing
special.

At twophase scale this is validated capability rather than a speedup (the
models are ≤ tens of M params and the bubble is (S-1)/(M+S-1)); it is the
layout for models whose *stage depth*, not batch, is what outgrows a chip.

Parity anchor: the stage semantics mirror the reference processor loops
(``src/models/enc_proc_dec.py:175-181``, ``proc_ufno.py:96-118``,
``proc_dilatedresnet.py:35-44``); equality with the sequential
``EncProcDec.apply`` is pinned by ``tests/test_pipeline_parallel.py``.
"""

import dataclasses
import inspect

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def make_dp_pp_mesh(n_pipe, devices=None):
    """2-D ("data", "pipe") mesh: DP rows x pipeline-stage columns."""
    from nps_tpu.parallel.mesh import make_dp_mesh
    return make_dp_mesh(n_pipe, "pipe", "pipeline_parallel", devices)


# ---------------------------------------------------------------------------
# stage protocol: how a processor decomposes into identical h -> h stages
# ---------------------------------------------------------------------------

# processor class name -> (canonical param key template at stage 0,
#                          per-stage param key template)
_BLOCK_STAGE_KEYS = {
    "UFNO": (("fno_layers_{}", "unet_layers_{}"),),
    "DilatedResnet": (("block_{}",),),
    "FNO": (("fno_layers_{}",),),
    "MoEFNO": (("experts_{}", "gate_{}"),),
}


def _single_stage_clone(proc):
    """An unbound copy of ``proc`` with one internal block (stage module)."""
    fields = {f.name: getattr(proc, f.name)
              for f in dataclasses.fields(proc)
              if f.init and f.name not in ("parent", "name")}
    fields["hidden_blocks"] = 1
    return type(proc)(**fields)


class _StageSplit:
    """Static description of the pipelined decomposition of an EncProcDec.

    mode 'block': single processor, one stage per internal block.
    mode 'processor': homogeneous processor list, one stage per processor.
    """

    def __init__(self, model):
        from nps_tpu.models.enc_proc_dec import EncProcDec, create_model

        assert isinstance(model, EncProcDec), \
            "pipeline parallelism expects the EncProcDec composition root " \
            "(pass ActivationWrapper models whole to make_pipelined_apply)"
        if model.data_structure != "grid":
            raise NotImplementedError(
                "pipeline_parallel supports grid models; the GNN path "
                "shards over data/space instead")
        self.model = model
        pde, base = model.pde, model._base_args()
        specs = model.processor_specs
        self.residual = bool(model.processor_residual)

        if len(specs) > 1:
            if any(not _spec_equal(s, specs[0]) for s in specs[1:]):
                raise ValueError(
                    "pipeline_parallel over a processor list requires all "
                    "processor specs to be identical (homogeneous stages); "
                    "heterogeneous chains (e.g. FNO->UFNO) cannot pipeline")
            self.mode = "processor"
            self.n_stages = len(specs)
            self.stage_module = create_model(specs[0], pde, base)
        else:
            proc = create_model(specs[0], pde, base)
            keys = _BLOCK_STAGE_KEYS.get(type(proc).__name__)
            if keys is None or not hasattr(proc, "hidden_blocks"):
                raise NotImplementedError(
                    f"no pipeline stage protocol for processor "
                    f"{type(proc).__name__}; supported: "
                    f"{sorted(_BLOCK_STAGE_KEYS)} or a homogeneous "
                    f"processor list")
            self.mode = "block"
            self.n_stages = int(proc.hidden_blocks)
            self.key_templates = keys[0]
            self.stage_module = _single_stage_clone(proc)
            self.residual = False  # intra-processor blocks have no chain
            #                        residual (it is inside the block if any)

        sig = inspect.signature(self.stage_module.__call__)
        self._takes_variables = "variables" in sig.parameters

    def stage_params(self, enc_proc_dec_params, i):
        """The param subtree of stage ``i`` in canonical (stage-0) naming."""
        p = enc_proc_dec_params
        if self.mode == "processor":
            return p[f"processor_{i}"]
        proc = p["processor_0"]
        return {t.format(0): proc[t.format(i)] for t in self.key_templates}

    def stack_params(self, enc_proc_dec_params):
        """Stack all stages' canonical subtrees on a leading axis."""
        stages = [self.stage_params(enc_proc_dec_params, i)
                  for i in range(self.n_stages)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)

    def apply_stage(self, stage_params, h, vb, pos, variables):
        # NB: Module.apply's own first parameter is named `variables`, so
        # the model-level conditioning vector must go in positionally
        if self._takes_variables:
            return self.stage_module.apply(
                {"params": stage_params}, h, variables,
                variables_broadcast=vb, pos=pos)
        return self.stage_module.apply(
            {"params": stage_params}, h, variables_broadcast=vb, pos=pos)


def _spec_equal(a, b):
    from argparse import Namespace

    def norm(s):
        return vars(s) if isinstance(s, Namespace) else s

    return norm(a) == norm(b)


# ---------------------------------------------------------------------------
# the pipelined apply
# ---------------------------------------------------------------------------

def make_pipelined_apply(model, mesh, n_micro=None):
    """Build ``apply_fn(variables, u, cond=, bc=, pos=, t_cond=,
    spatial_cond=)`` semantically equal to ``model.apply`` (grid path) but
    with the processor chain pipelined over ``mesh``'s "pipe" axis.

    ``n_micro``: microbatches per local (data-shard) batch; None -> one
    sample per microbatch (maximum stream depth). Must divide the local
    batch size.
    """
    from nps_tpu.models import config as model_config
    from nps_tpu.models.activation_wrapper import (
        ActivationWrapper, _apply_spatial_cond, volume_preserve)
    from nps_tpu.models.activations import resolve_activation
    from nps_tpu.models.enc_proc_dec import create_model
    from nps_tpu.utils.broadcast import broadcast_to_grid_last

    # the physics wrapper is parameter-free elementwise/reduction math on
    # the inner output; unwrap it and replay it after the decoder
    orig_model = model
    wrapper = model if isinstance(model, ActivationWrapper) else None
    if wrapper is not None:
        model = wrapper.inner
    split = _StageSplit(model)
    n_pipe = int(dict(mesh.shape)["pipe"])
    if split.n_stages % n_pipe != 0:
        raise ValueError(
            f"pipeline_parallel={n_pipe} must divide the stage count "
            f"{split.n_stages} ({split.mode}-granularity)")
    stages_per_dev = split.n_stages // n_pipe

    pde, base = model.pde, model._base_args()
    enc_mod = create_model(model.encoder, pde, base)
    dec_mod = create_model(model.decoder, pde, base)
    bc_mod = None
    if model.bc_encoder is not None:
        bc_mod = create_model(
            model.bc_encoder, pde, base,
            extra_kwargs=dict(bc_encoder_in=pde.n_cond_dynamic))

    def _stage_chain(stacked_local, h, vb, pos, variables, dev_stage):
        # stacked_local leaves: [stages_per_dev, ...]
        for k in range(stages_per_dev):
            sp = jax.tree_util.tree_map(lambda x: x[k], stacked_local)
            h_next = split.apply_stage(sp, h, vb, pos, variables)
            if split.residual:
                g = dev_stage * stages_per_dev + k  # global stage index
                h_next = jnp.where(g > 0, h_next + h, h_next)
            h = h_next
        return h

    def _gpipe(stacked_local, h0, vb, pos, variables):
        """h0: [b_loc, *grid, C] encoder output on this data shard."""
        b_loc = h0.shape[0]
        M = b_loc if n_micro is None else int(n_micro)
        assert b_loc % M == 0, \
            f"pipeline microbatches {M} must divide local batch {b_loc}"
        mb = b_loc // M

        def micro(x):
            return (None if x is None
                    else x.reshape((M, mb) + x.shape[1:]))

        h0m, vbm, posm, varm = micro(h0), micro(vb), micro(pos), \
            micro(variables)
        stage = jax.lax.axis_index("pipe")

        def sel(xm, m):
            return (None if xm is None
                    else jax.lax.dynamic_index_in_dim(xm, m, 0,
                                                      keepdims=False))

        def tick(carry, t):
            state, outs = carry
            feed = sel(h0m, jnp.clip(t, 0, M - 1))
            h_in = jnp.where(stage == 0, feed, state)
            # the microbatch resident on this stage at tick t (clipped to a
            # valid index during bubble ticks, whose results are discarded)
            m = jnp.clip(t - stage, 0, M - 1)
            out = _stage_chain(stacked_local, h_in, sel(vbm, m),
                               sel(posm, m), sel(varm, m), stage)
            oidx = jnp.clip(t - (n_pipe - 1), 0, M - 1)
            prev = sel(outs, oidx)
            keep = (stage == n_pipe - 1) & (t >= n_pipe - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(keep, out, prev), oidx, 0)
            if n_pipe > 1:
                state = jax.lax.ppermute(
                    out, "pipe", [(i, i + 1) for i in range(n_pipe - 1)])
            else:
                state = out
            return (state, outs), None

        init = (jnp.zeros_like(h0m[0]), jnp.zeros_like(h0m))
        (_, outs), _ = jax.lax.scan(tick, init,
                                    jnp.arange(M + n_pipe - 1))
        # last stage holds the results; broadcast to every pipe rank so the
        # replicated decoder can run without a gather
        outs = jax.lax.psum(
            jnp.where(stage == n_pipe - 1, outs, jnp.zeros_like(outs)),
            "pipe")
        return outs.reshape((b_loc,) + h0.shape[1:])

    n_data = int(dict(mesh.shape)["data"])

    def apply_fn(variables_dict, u, cond=None, bc=None, pos=None,
                 t_cond=None, spatial_cond=None):
        # remainder batches (e.g. the tail of an eval split) that don't
        # tile the ("data", micro) layout run the sequential apply — the
        # same semantics, just unpipelined (mirrors the DP path, which
        # leaves remainder batches unsharded)
        b = int(u.shape[0])
        b_loc = b // n_data
        m = b_loc if n_micro is None else int(n_micro)
        if b % n_data != 0 or b_loc == 0 or b_loc % m != 0:
            return orig_model.apply(
                variables_dict, u, cond=cond, bc=bc, pos=pos, t_cond=t_cond,
                spatial_cond=spatial_cond)
        params = variables_dict["params"]
        if wrapper is not None:
            params = params["inner"]
        stacked = split.stack_params(params)
        enc_p = params["encoder"]
        dec_p = params["decoder"]
        bc_p = params.get("bc_encoder") if bc_mod is not None else None

        def check_none(x):
            return None if (x is None or x.size == 0) else x

        cond = check_none(cond)
        bc = check_none(bc)
        pos = check_none(pos)
        t_cond = check_none(t_cond)
        spatial_cond = check_none(spatial_cond)

        # assemble (arg, spec) pairs; None args stay host-side closures
        batch_args = dict(u=u, cond=cond, bc=bc, pos=pos, t_cond=t_cond,
                          spatial_cond=spatial_cond)
        names = [k for k, v in batch_args.items() if v is not None]
        args = [batch_args[k] for k in names]
        specs = [P("data")] * len(names)

        def sharded(stacked, enc_p, dec_p, bc_p, *batch):
            a = dict(zip(names, batch))
            u_l = a["u"]
            cond_l = a.get("cond")
            bc_l = a.get("bc")
            pos_l = a.get("pos")
            t_cond_l = a.get("t_cond")
            sc_l = a.get("spatial_cond")

            # ---- conditioning embedding (mirrors EncProcDec.__call__,
            #      grid path; parity: src/models/base.py:24-73) ----
            var_list = []
            if cond_l is not None:
                var_list.append(cond_l)
            bc_in = None
            if bc_l is not None and t_cond_l is not None:
                bc_in = jnp.concatenate([bc_l, t_cond_l], axis=1)
            elif bc_l is not None:
                bc_in = bc_l
            elif t_cond_l is not None:
                bc_in = t_cond_l
            if bc_in is not None and bc_mod is not None:
                var_list.append(bc_mod.apply({"params": bc_p}, bc_in))
            variables = (jnp.concatenate(var_list, axis=1)
                         if var_list else None)

            sp = u_l.shape[3:]
            if variables is not None:
                vb = broadcast_to_grid_last(variables, sp)
                if sc_l is not None:
                    vb = jnp.concatenate(
                        [vb, jnp.moveaxis(sc_l, 1, -1)], axis=-1)
            else:
                vb = (jnp.moveaxis(sc_l, 1, -1) if sc_l is not None
                      else None)
            if vb is not None:
                vb = model_config.cast_compute(vb)

            h0 = enc_mod.apply({"params": enc_p}, u=u_l,
                               variables_broadcast=vb, pos=pos_l)
            h = _gpipe(stacked, h0, vb, pos_l, variables)
            # grid decoders consume (h, u) and absorb the rest via **kwargs;
            # `variables` cannot be forwarded through a root .apply (it
            # collides with Module.apply's own first parameter) — no grid
            # decoder reads it (dec_grid.py), pinned by the equality tests
            out = dec_mod.apply({"params": dec_p}, h, u_l,
                                variables_broadcast=vb, pos=pos_l)
            if wrapper is not None:
                # replay ActivationWrapper.__call__ (grid path) verbatim
                act = resolve_activation(wrapper.activation_final)
                out = act(out)
                if wrapper.enforce_spatial_cond:
                    out = _apply_spatial_cond(sc_l, out,
                                              wrapper.spatial_cond_channel)
                if wrapper.approx_volume_preserve:
                    out = volume_preserve(
                        out, u_l, wrapper.approx_volume_preserve_mode,
                        wrapper.max_pct_dif)
                    if wrapper.enforce_spatial_cond:
                        out = _apply_spatial_cond(
                            sc_l, out, wrapper.spatial_cond_channel)
            return out

        fn = jax.shard_map(
            sharded, mesh=mesh,
            in_specs=(P("pipe"), P(), P(), P(), *specs),
            out_specs=P("data"),
            check_vma=False)
        return fn(stacked, enc_p, dec_p, bc_p, *args)

    return apply_fn
