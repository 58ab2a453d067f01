"""A/B: MPGNN message aggregation — segment_sum (scatter) vs padded
neighbor-matrix gather (dense) — on the real TPU at twophase GNN scale.

Run: python tools/bench_gnn_agg.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nps_tpu.common import graph as G  # noqa: E402
from nps_tpu.pde.base import PDE2D

B, NX1, NX2 = 16, 96, 64
HID, BLOCKS = 128, 6
NEIGHBORS = 2


def build():
    pde = PDE2D(tmin=0, tmax=10, nt=501, L1=1.0, L2=0.66, nx1=NX1, nx2=NX2,
                x=None, name="NS")
    single = G.grid_edges(pde, pde.x, NEIGHBORS)
    nx = NX1 * NX2
    edges = G.tile_edges(single, nx, B)
    n = B * nx
    pos_x = G.flat_positions(pde.x)
    pos = np.tile(pos_x, (B, 1)).astype(np.float32)
    print(f"nodes={n} edges={edges.shape[1]} "
          f"avg_deg={edges.shape[1] / n:.1f}")

    # padded neighbor matrix [N, D] + mask
    recv = edges[1]
    send = edges[0]
    deg = np.bincount(recv, minlength=n)
    D = int(deg.max())
    nbr = np.zeros((n, D), np.int32)
    mask = np.zeros((n, D), np.float32)
    slot = np.zeros(n, np.int64)
    for s, r in zip(send, recv):
        nbr[r, slot[r]] = s
        mask[r, slot[r]] = 1.0
        slot[r] += 1
    print(f"max_deg={D} pad_waste={(1 - edges.shape[1] / (n * D)) * 100:.0f}%")
    return n, edges, nbr, mask, pos


def mlp(w1, w2, x):
    return jnp.maximum(x @ w1, 0.0) @ w2


def main():
    n, edges, nbr, mask, pos = build()
    rng = np.random.default_rng(0)
    h0 = rng.standard_normal((n, HID)).astype(np.float32)
    k1 = (rng.standard_normal((2 * HID + 2, HID)) / 20).astype(np.float32)
    k2 = (rng.standard_normal((HID, HID)) / 20).astype(np.float32)
    u1 = (rng.standard_normal((2 * HID, HID)) / 20).astype(np.float32)
    u2 = (rng.standard_normal((HID, HID)) / 20).astype(np.float32)

    send, recv = edges[0], edges[1]
    deg = np.maximum(np.bincount(recv, minlength=n), 1).astype(np.float32)

    def layer_scatter(h, w):
        k1, k2, u1, u2 = w
        m = jnp.concatenate([h[recv], h[send], pos[recv] - pos[send]], -1)
        m = mlp(k1, k2, m)
        agg = jax.ops.segment_sum(m, recv, num_segments=n,
                                  indices_are_sorted=True) / deg[:, None]
        return h + mlp(u1, u2, jnp.concatenate([h, agg], -1))

    def layer_gather(h, w):
        k1, k2, u1, u2 = w
        hn = h[nbr]                             # [N, D, F]
        hi = jnp.broadcast_to(h[:, None], hn.shape)
        rel = pos[:, None] - pos[nbr]           # [N, D, 2]
        m = mlp(k1, k2, jnp.concatenate([hi, hn, rel], -1))
        agg = (m * mask[:, :, None]).sum(1) / deg[:, None]
        return h + mlp(u1, u2, jnp.concatenate([h, agg], -1))

    def net(layer):
        def f(h, w):
            def loss(h):
                for _ in range(BLOCKS):
                    h = layer(h, w)
                return jnp.sum(h ** 2)
            return jax.value_and_grad(loss)(h)
        return jax.jit(f)

    w = (k1, k2, u1, u2)
    for name, layer in [("segment_sum", layer_scatter),
                        ("padded_gather", layer_gather)]:
        f = net(layer)
        v, g = f(h0, w)
        float(v)  # sync (axon: block_until_ready is a no-op)
        t0 = time.perf_counter()
        for _ in range(10):
            v, g = f(h0, w)
        float(v + jnp.sum(g))
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt * 1e3:.1f} ms/step "
              f"({B / dt:.1f} samples/s fwd+bwd, {BLOCKS} layers)")


if __name__ == "__main__":
    main()
