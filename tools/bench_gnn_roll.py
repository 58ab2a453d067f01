"""A/B: grid-structured message passing — shifted-grid (roll) form vs the
shipped gather/segment_sum form (VERDICT r2 item 9).

On a regular grid every edge offset is a constant (di, dj), so
gather(sender) collapses to a masked shift of the node grid and the
rel-pos projection Wp(p_r - p_s) to a constant per-offset bias vector.
The edge set becomes n_offsets dense node-space ops: no [E, C] gathers,
no scatter-add, no [E, 2] lane-padded rel_pos — at identical FLOPs for
the edge-MLP matmuls (n_offsets * N rows either way).

This microbench times ONE MPGNN layer's full computation (edge MLP +
aggregation + node MLP), forward+backward, both ways, at the BASELINE.md
GNN bench shape (batch 8 x 128^2 grid, C=128, neighbors=2), and checks
the two forms agree numerically on a small grid first.

Run on the real chip: python tools/bench_gnn_roll.py
"""

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def offsets_for_radius(nx, ny, dx1, dx2, n):
    """Integer grid offsets within the NS radius rule n*hypot(dx1,dx2)+eps."""
    # shipped rule (common/graph.py grid_edges): eps pads the RADIUS, not
    # its square — padding the square admitted extra offsets here
    r2 = (n * float(np.hypot(dx1, dx2)) + 1e-4) ** 2
    out = []
    m = int(np.ceil(n * np.hypot(dx1, dx2) / min(dx1, dx2))) + 1
    for di in range(-m, m + 1):
        for dj in range(-m, m + 1):
            if (di, dj) == (0, 0):
                continue
            if (di * dx1) ** 2 + (dj * dx2) ** 2 <= r2:
                out.append((di, dj))
    return out


def build_edges_from_offsets(b, nx, ny, offsets):
    """Receiver-sorted [2, E] edge list equal to the offset structure."""
    sends, recvs = [], []
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    for e in range(b):
        base = e * nx * ny
        for di, dj in offsets:
            si, sj = ii + di, jj + dj
            ok = (si >= 0) & (si < nx) & (sj >= 0) & (sj < ny)
            recvs.append(base + (ii[ok] * ny + jj[ok]))
            sends.append(base + (si[ok] * ny + sj[ok]))
    send = np.concatenate(sends)
    recv = np.concatenate(recvs)
    order = np.argsort(recv, kind="stable")
    return np.stack([send[order], recv[order]]).astype(np.int32)


def main(check_only=False):
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16

    def make_weights(c, key):
        ks = jax.random.split(key, 8)
        s = 1.0 / np.sqrt(c)
        return dict(
            Wr=jax.random.normal(ks[0], (c, c), jnp.float32) * s,
            br=jnp.zeros((c,), jnp.float32),
            Ws=jax.random.normal(ks[1], (c, c), jnp.float32) * s,
            Wp=jax.random.normal(ks[2], (2, c), jnp.float32),
            W2=jax.random.normal(ks[3], (c, c), jnp.float32) * s,
            b2=jnp.zeros((c,), jnp.float32),
            Wn=jax.random.normal(ks[4], (2 * c, c), jnp.float32) * s,
            bn=jnp.zeros((c,), jnp.float32),
        )

    def act(x):
        return jax.nn.silu(x)

    # ---------------- gather/segment_sum form (shipped math) -------------
    def layer_gather(w, h, pos, send, recv, degree_inv):
        hr = h.astype(dt) @ w["Wr"].astype(dt) + w["br"].astype(dt)
        hs = h.astype(dt) @ w["Ws"].astype(dt)
        pp = pos.astype(dt) @ w["Wp"].astype(dt)
        m = act(hr[recv] + hs[send] + pp[recv] - pp[send])
        m = act(m @ w["W2"].astype(dt) + w["b2"].astype(dt))
        agg = jax.ops.segment_sum(m, recv, num_segments=h.shape[0],
                                  indices_are_sorted=True)
        agg = agg * degree_inv[:, None].astype(dt)
        upd = jnp.concatenate([h.astype(dt), agg], axis=-1)
        return h.astype(dt) + act(upd @ w["Wn"].astype(dt) +
                                  w["bn"].astype(dt))

    # ---------------- roll (shifted-grid) form ---------------------------
    def layer_roll(w, hg, offsets, dxy, degree_inv_grid):
        """hg: [b, nx, ny, c]; same math, offsets as masked shifts."""
        b, nx, ny, c = hg.shape
        hr = hg.astype(dt) @ w["Wr"].astype(dt) + w["br"].astype(dt)
        hs = hg.astype(dt) @ w["Ws"].astype(dt)
        agg = jnp.zeros_like(hr)
        for (di, dj) in offsets:
            # sender = node + (di, dj); rel-pos term is the constant
            # Wp @ (p_recv - p_send) = -Wp @ (di*dx1, dj*dx2)
            cvec = (-(jnp.asarray([di * dxy[0], dj * dxy[1]], jnp.float32)
                      @ w["Wp"])).astype(dt)
            lo_i, hi_i = max(di, 0), nx + min(di, 0)
            lo_j, hi_j = max(dj, 0), ny + min(dj, 0)
            shifted = jnp.zeros_like(hs)
            shifted = shifted.at[:, lo_i - di:hi_i - di,
                                 lo_j - dj:hi_j - dj].set(
                hs[:, lo_i:hi_i, lo_j:hi_j])
            valid = jnp.zeros((nx, ny), dt)
            valid = valid.at[lo_i - di:hi_i - di, lo_j - dj:hi_j - dj].set(1)
            m = act(hr + shifted + cvec)
            m = act(m @ w["W2"].astype(dt) + w["b2"].astype(dt))
            agg = agg + m * valid[None, :, :, None]
        agg = agg * degree_inv_grid[None, :, :, None].astype(dt)
        upd = jnp.concatenate([hg.astype(dt), agg], axis=-1)
        return hg.astype(dt) + act(upd @ w["Wn"].astype(dt) +
                                   w["bn"].astype(dt))

    def degree_grid(nx, ny, offsets):
        d = np.zeros((nx, ny), np.float32)
        ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        for di, dj in offsets:
            si, sj = ii + di, jj + dj
            d += ((si >= 0) & (si < nx) & (sj >= 0) & (sj < ny))
        return 1.0 / np.maximum(d, 1.0)

    # ---------------- correctness on a small grid ------------------------
    b, nx, ny, c = 2, 8, 6, 16
    dx1, dx2 = 1.0 / nx, 0.66 / ny
    offsets = offsets_for_radius(nx, ny, dx1, dx2, 2)
    edges = build_edges_from_offsets(b, nx, ny, offsets)
    w = make_weights(c, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hg = rng.standard_normal((b, nx, ny, c)).astype(np.float32)
    h = hg.reshape(b * nx * ny, c)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pos1 = np.stack([ii * dx1, jj * dx2], -1).reshape(-1, 2)
    pos = np.tile(pos1, (b, 1)).astype(np.float32)
    dinv_g = degree_grid(nx, ny, offsets)
    dinv = np.tile(dinv_g.reshape(-1), b)

    out_g = np.asarray(jax.jit(layer_gather)(
        w, h, pos, edges[0], edges[1], jnp.asarray(dinv)), np.float32)
    out_r = np.asarray(jax.jit(
        lambda w, hg: layer_roll(w, hg, tuple(offsets), (dx1, dx2),
                                 jnp.asarray(dinv_g)))(w, hg), np.float32)
    err = np.abs(out_r.reshape(-1, c) - out_g).max() / \
        (np.abs(out_g).max() + 1e-9)
    print(f"correctness: n_offsets={len(offsets)} rel err {err:.2e}")
    assert err < 2e-2, "roll form disagrees with gather form"  # bf16 assoc
    if check_only:
        return

    # ---------------- timed A/B at the bench shape -----------------------
    b, nx, ny, c = 8, 128, 128, 128
    dx1 = dx2 = 1.0 / nx
    offsets = offsets_for_radius(nx, ny, dx1, dx2, 2)
    edges = build_edges_from_offsets(b, nx, ny, offsets)
    print(f"bench shape: {b}x{nx}x{ny}, C={c}, n_offsets={len(offsets)}, "
          f"E={edges.shape[1]}")
    w = make_weights(c, jax.random.PRNGKey(1))
    hg = rng.standard_normal((b, nx, ny, c)).astype(np.float32)
    h = hg.reshape(-1, c)
    pos1 = np.stack(np.meshgrid(np.arange(nx) * dx1, np.arange(ny) * dx2,
                                indexing="ij"), -1).reshape(-1, 2)
    pos = np.tile(pos1, (b, 1)).astype(np.float32)
    dinv_g = degree_grid(nx, ny, offsets)
    dinv = np.tile(dinv_g.reshape(-1), b)

    def loss_gather(w, h):
        return jnp.sum(layer_gather(w, h, pos_d, send_d, recv_d,
                                    dinv_d).astype(jnp.float32))

    def loss_roll(w, hg):
        return jnp.sum(layer_roll(w, hg, tuple(offsets), (dx1, dx2),
                                  dinv_gd).astype(jnp.float32))

    import jax  # noqa: F811

    pos_d = jax.device_put(pos)
    send_d = jax.device_put(edges[0])
    recv_d = jax.device_put(edges[1])
    dinv_d = jax.device_put(dinv)
    dinv_gd = jax.device_put(dinv_g)
    h_d = jax.device_put(h)
    hg_d = jax.device_put(hg)

    g_gather = jax.jit(jax.value_and_grad(loss_gather, argnums=(0, 1)))
    g_roll = jax.jit(jax.value_and_grad(loss_roll, argnums=(0, 1)))

    for name, fn, arg in [("gather", g_gather, h_d), ("roll", g_roll, hg_d)]:
        v, _ = fn(w, arg)
        float(v)  # force readback (block_until_ready no-op on axon)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            v, _ = fn(w, arg)
        float(v)
        dt_ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:8s}: {dt_ms:8.2f} ms/layer fwd+bwd", flush=True)


if __name__ == "__main__":
    main(check_only="--check-only" in sys.argv)
