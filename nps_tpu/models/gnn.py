"""Node-space GNN components for the ``M.AR_TB_GNN`` model interface.

The reference keeps the GNN calling convention alive (``D``/``M`` contract,
``EncProcDec``'s graph branch at ``src/models/enc_proc_dec.py:139-168``, the
trainer branches at ``src/trainers/autoregressivepushforwardtrainer.py:97-158``)
but ships no GNN processor of its own — the message-passing architecture it
was built around is MP-PDE (Brandstetter et al., arXiv:2202.03376), the same
lineage as the ``ElementWise`` grid encoder. These components restore that
capability TPU-natively:

- :class:`NodeElementWise` — per-node MLP encoder, the node-space twin of
  ``enc_grid.ElementWise``;
- :class:`MPGNN` — message-passing processor: edge MLP on
  (h_i, h_j, pos_i - pos_j) aggregated with ``jax.ops.segment_sum`` (static
  node count, receiver-sorted edges from
  :mod:`nps_tpu.common.graph`), node MLP update, residual per layer;
- :class:`NodeTimeConvDense` — node-space twin of ``dec_grid.TimeConvDense``
  (the decoders already operate per pixel, so node space is the natural
  layout), emitting a delta via ``add_delta``.

TPU notes: with the batch-tiled static edge set, message passing is two
gathers + one ``segment_sum`` + dense MLPs — all static shapes, fully
jit/scan/grad-compatible, and the MLPs are batched matmuls on the MXU.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.common.interfaces import D, M
from nps_tpu.models import config as model_config
from nps_tpu.models.activations import Swish, resolve_activation
from nps_tpu.models.dec_grid import add_delta


import numpy as np


def _flatten_nodes(u):
    """[N, c, tw] -> [N, c*tw] (torch-flatten channel order)."""
    return u.reshape(u.shape[0], -1)


def _shift_slices(sp, off):
    """Slices implementing sender = receiver + off on an sp-shaped grid.

    Returns (src, dst, pads): ``out[dst] = x[src]`` writes each in-bounds
    sender's value at its receiver's position; ``dst`` also indexes the
    receivers that have an in-bounds sender for this offset (the mask);
    ``pads`` are the per-spatial-dim zero-pad widths such that
    ``pad(x[src], pads)`` equals the dst-scatter (the slice+pad form).
    """
    src, dst, pads = [], [], []
    for s, d in zip(sp, off):
        lo, hi = max(d, 0), s + min(d, 0)
        src.append(slice(lo, hi))
        dst.append(slice(lo - d, hi - d))
        pads.append((lo - d, s - (hi - d)))
    return tuple(src), tuple(dst), pads


class NodeElementWise(nn.Module):
    """Per-node two-layer MLP encoder on [window, pos, conditioning]."""

    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    n_cond: int = 0
    activation: Any = Swish()

    @nn.compact
    def __call__(self, u, pos=None, variables_broadcast=None,
                 edge_index=None, batch=None, grid_meta=None):
        act = resolve_activation(self.activation)
        parts = [_flatten_nodes(u)]
        if pos is not None:
            parts.append(pos)
        if variables_broadcast is not None:
            parts.append(variables_broadcast)
        h = jnp.concatenate(parts, axis=-1)
        dt = model_config.compute_dtype()
        h = act(nn.Dense(self.hidden_features, dtype=dt,
                         name="encoder_0")(h))
        return act(nn.Dense(self.hidden_features, dtype=dt,
                            name="encoder_2")(h))


class MPGNNLayer(nn.Module):
    """One message-passing step: edge MLP -> segment-sum -> node MLP.

    The edge MLP's first layer is ``Dense([h_i, h_j, pos_i - pos_j])``
    conceptually, but it is computed in the project-then-gather form —
    exactly equal by row-partitioning the weight matrix and linearity of
    the (bias-free) position term::

        W [h_i; h_j; p_i - p_j] + b
            = (Wr h)[recv] + (Ws h)[send] + (Wp p)[recv] - (Wp p)[send] + b

    so the projections run as [N, h] node-level matmuls (E/N ~ 8-60x
    smaller than edge-level) and no [E, 2h+nd] concat or lane-padded
    [E, nd] tensor ever materializes (measured on a 16x128^2-node batch,
    radius-3 edges: the concat form needs 60+ GB — the [E,2] rel_pos
    alone lane-pads 64x to 7.75 GB — vs ~2 GB per edge tensor here).
    """

    hidden_features: int = 128
    activation: Any = Swish()
    aggregate: str = "mean"  # 'mean' | 'sum'
    # process edges in K slices, accumulating the [N, h] aggregate between
    # slices: peak edge-tensor memory drops from O(E) to O(E/K) in both
    # passes (each slice is rematerialized in the backward). Edges are
    # receiver-sorted globally, so every slice is a sorted slice and the
    # per-slice segment_sums add up exactly (modulo float association).
    # The effective K is the largest divisor of E <= edge_chunks.
    edge_chunks: int = 1

    @nn.compact
    def __call__(self, h, pos, edge_index, degree_inv=None, grid_meta=None):
        act = resolve_activation(self.activation)
        send, recv = edge_index[0], edge_index[1]
        dt = model_config.compute_dtype()
        hr = nn.Dense(self.hidden_features, dtype=dt,
                      name="edge_0_recv")(h)
        hs = nn.Dense(self.hidden_features, use_bias=False, dtype=dt,
                      name="edge_0_send")(h)
        pos_proj = nn.Dense(self.hidden_features, use_bias=False, dtype=dt,
                            name="edge_0_pos")

        if grid_meta is not None:
            # shifted-grid fast path: on a regular grid every edge is a
            # constant integer offset, so gather(sender) is a masked shift
            # of the node grid and Wp(pos_r - pos_s) a constant per-offset
            # vector (linearity; bias-free projection). No [E, C] gathers,
            # no scatter (the shift is slice+pad: scatter HLO here blew
            # the compile to 40+ min). Measured at 8x128^2/C=128/
            # neighbors=2: 19 ms/layer fwd+bwd vs ~200 gather — and end
            # to end through the shipped trainer step, 44.4 vs 3.43
            # samples/s (13x, no remat needed: the edge tensors that
            # forced remat/batch-8 on the gather path don't exist).
            # Identical math modulo float association; equality-tested in
            # tests/test_gnn.py.
            sp, offsets, deltas = grid_meta
            edge2 = nn.Dense(self.hidden_features, dtype=dt, name="edge_2")
            b = h.shape[0] // int(np.prod(sp))
            c = hr.shape[-1]
            gshape = (b,) + tuple(sp) + (c,)
            hr_g = hr.reshape(gshape)
            hs_g = hs.reshape(gshape)
            # [K, nd] constant position deltas -> [K, C] FiLM-like biases
            pp_delta = pos_proj(jnp.asarray(deltas, jnp.float32))
            agg = jnp.zeros_like(hr_g)
            for kk, off in enumerate(offsets):
                src, dst, pads = _shift_slices(sp, off)
                # shift = slice + zero-pad (no scatter: friendlier HLO)
                shifted = jnp.pad(hs_g[(slice(None),) + src],
                                  [(0, 0)] + pads + [(0, 0)])
                m = act(hr_g + shifted + pp_delta[kk])
                m = act(edge2(m))
                mask = np.zeros(tuple(sp), np.float32)
                mask[dst] = 1.0  # host constant
                agg = agg + m * jnp.asarray(mask, m.dtype)[None, ..., None]
            agg = agg.reshape(h.shape[0], c)
        else:
            def messages(mdl, hr, hs, pp, s, r):
                act = resolve_activation(mdl.activation)
                m = act(hr[r] + hs[s] + pp[r] - pp[s])
                m = act(nn.Dense(mdl.hidden_features,
                                 dtype=model_config.compute_dtype(),
                                 name="edge_2")(m))  # shared across slices
                return jax.ops.segment_sum(m, r, num_segments=hr.shape[0],
                                           indices_are_sorted=True)

            pp = pos_proj(pos)
            n_edges = int(send.shape[0])
            k = max(1, min(int(self.edge_chunks), n_edges))
            while n_edges % k:
                k -= 1
            if k == 1:
                agg = messages(self, hr, hs, pp, send, recv)
            else:
                chunk_fn = nn.remat(messages)
                agg = jnp.zeros_like(hr)
                for s, r in zip(send.reshape(k, -1), recv.reshape(k, -1)):
                    # the barrier makes this chunk's indices depend on the
                    # previous accumulation: without it XLA's scheduler
                    # prefetches every chunk's gather concurrently (they only
                    # depend on hr/hs/pp) and peak memory reverts to O(E)
                    agg, s, r = jax.lax.optimization_barrier((agg, s, r))
                    agg = agg + chunk_fn(self, hr, hs, pp, s, r)
        if self.aggregate == "mean" and degree_inv is not None:
            agg = agg * degree_inv[:, None]
        upd = jnp.concatenate([h, agg], axis=-1)
        upd = act(nn.Dense(self.hidden_features, dtype=dt,
                           name="node_0")(upd))
        upd = nn.Dense(self.hidden_features, dtype=dt,
                       name="node_2")(upd)
        return h + upd  # residual per layer


class MPGNN(nn.Module):
    """Message-passing processor (MP-PDE style) over a static GridGraph."""

    model_interface = M.AR_TB_GNN
    data_interface = (D.sim1d, D.sim2d)

    pde: Any = None
    hidden_features: int = 128
    hidden_blocks: int = 6
    num_spatial_dims: int = 1
    n_cond: int = 0
    activation: Any = Swish()
    aggregate: str = "mean"
    # rematerialize each message-passing layer in the backward pass: the
    # edge-MLP activations are [E, hidden] (~4 GB/layer at 16x128^2 nodes,
    # radius-3 edges) while the layer INPUT is only [N, hidden] (~67 MB) —
    # without remat a 6-layer batch-16 backward cannot fit HBM
    remat: bool = False
    # slice the per-layer edge work into K rematted chunks (see
    # MPGNNLayer.edge_chunks): bounds edge memory to O(E/K), enabling
    # batches whose full edge set exceeds HBM
    edge_chunks: int = 1

    @nn.compact
    def __call__(self, h, variables_broadcast=None, pos=None,
                 edge_index=None, batch=None, grid_meta=None):
        assert edge_index is not None, "MPGNN needs graph edges"
        recv = edge_index[1]
        degree_inv = None
        if self.aggregate == "mean":
            # degrees in f32: bf16 integer counts go inexact above 256 and
            # 1/deg would round, biasing the mean at large-radius configs
            deg = jax.ops.segment_sum(
                jnp.ones(recv.shape, jnp.float32), recv,
                num_segments=h.shape[0], indices_are_sorted=True)
            degree_inv = jnp.where(deg > 0, 1.0 / deg, 0.0).astype(h.dtype)
        if variables_broadcast is not None:
            h = jnp.concatenate([h, variables_broadcast], axis=-1)
            h = nn.Dense(self.hidden_features,
                         dtype=model_config.compute_dtype(),
                         name="cond_proj")(h)
        layer_cls = nn.remat(MPGNNLayer, static_argnums=(5,)) \
            if self.remat else MPGNNLayer
        for i in range(self.hidden_blocks):
            h = layer_cls(self.hidden_features, self.activation,
                          self.aggregate, self.edge_chunks,
                          name=f"mp_{i}")(h, pos, edge_index, degree_inv,
                                          grid_meta)
        return h


class NodeTimeConvDense(nn.Module):
    """Node-space ``TimeConvDense``: dense to tw*3*num_c, then a 2-layer
    time CNN per node, then ``add_delta`` against the last input frame
    (same derived kernel sizes as ``dec_grid.py:110-124``)."""

    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    activation: Any = "gelu"
    dec_delta_mode: str = "per_step"
    dec_delta_dt: bool = True

    @nn.compact
    def __call__(self, h, u, variables=None, variables_broadcast=None,
                 pos=None, edge_index=None, batch=None, grid_meta=None):
        act = resolve_activation(self.activation)
        tw = self.time_window
        h = nn.Dense(tw * 3 * self.num_c,
                     dtype=model_config.compute_dtype(),
                     name="pre_decoder")(h)

        kernel_size_a = math.ceil(tw / 2)
        kernel_size_b = math.ceil(tw / 4) + 1
        if tw % 4 == 0:
            kernel_size_b += 1

        x = h.reshape((-1, self.num_c, tw * 3))      # (c, t) c-major
        x = jnp.swapaxes(x, 1, 2)                    # [N, tw*3, num_c]
        x = nn.Conv(self.num_c * 2, (kernel_size_a,), strides=(2,),
                    dtype=model_config.compute_dtype(),
                    padding="VALID", name="decoder_0")(x)
        x = act(x)
        x = nn.Conv(self.num_c, (kernel_size_b,), padding="VALID",
                    dtype=model_config.compute_dtype(),
                    name="decoder_2")(x)
        delta = jnp.swapaxes(x, 1, 2)                # [N, num_c, tw]
        # node tensors are [N, c, tw] = the grid layout with 0 spatial dims
        return add_delta(delta, u, self.pde.dt, tw, 0,
                         self.dec_delta_mode, self.dec_delta_dt)
