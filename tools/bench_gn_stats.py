"""Micro A/B: GroupNorm(groups=1) statistics as VPU reduces vs MXU dots.

BASELINE.md's post-tanh decomposition leaves the GN stat reduces running at
156-217 GB/s (vs 819 peak) as one of the two remaining terms over the
302.6 ms roofline floor. The reduce formulation (convert-to-f32 + two
`jnp.mean`s, fused by XLA into one multi-output reduce pass) may not be
bandwidth-optimal on the VPU; the MXU alternative computes the same f32
statistics as matmuls, which the MXU pipelines at full HBM rate:

    s1 = x_flat @ ones          (bf16 x bf16 -> f32 accumulate)
    s2 = <x_flat, x_flat>_batch (batched inner product, f32 accumulate)

Both accumulate in f32 (MXU native), so the numerics match the current
GroupNormFast (convert-then-reduce) up to reduction order.

Method: K self-chained GN applications inside ONE jit (y = GN(y) repeated;
each pass reads+writes the full tensor, so ms/pass measures the fused
kernel at HBM, amortizing the ~2.4 ms axon dispatch). fwd and fwd+bwd.

Usage: python tools/bench_gn_stats.py [K] [iters]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

B, H, W, C = (int(v) for v in os.environ.get(
    "GN_SHAPE", "16,132,132,388").split(","))
EPS = 1e-5


def gn_reduce(x):
    """Current GroupNormFast formulation (groups=1, no affine)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    dt = x.dtype
    return (x - mean.astype(dt)) * inv.astype(dt)


def gn_mxu(x):
    """Same statistics via MXU dots (f32 accumulation on the MXU)."""
    b = x.shape[0]
    xr = x.reshape(b, -1)
    n = xr.shape[1]
    ones = jnp.ones((n,), x.dtype)
    s1 = jax.lax.dot_general(xr, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(xr, xr, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    shape = (b,) + (1,) * (x.ndim - 1)
    dt = x.dtype
    return (x - mean.reshape(shape).astype(dt)) * inv.reshape(shape).astype(dt)


def chain(fn, k):
    def run(x):
        for i in range(k):
            # vary by a tiny per-iteration bias so XLA cannot CSE passes
            x = fn(x + jnp.asarray(i, x.dtype) * jnp.asarray(1e-8, x.dtype))
        return jnp.sum(x.astype(jnp.float32))
    return run


def timed(f, x, iters):
    f(x)  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x))  # host readback forces completion (axon: no block_until_ready)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    x = jax.device_put(x)
    bytes_pass = 2 * x.size * x.dtype.itemsize  # read + write per pass

    # numeric agreement first
    ya = jax.jit(gn_reduce)(x)
    yb = jax.jit(gn_mxu)(x)
    md = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    print(f"max |reduce - mxu| = {md:.3e} (bf16 quantum at |y|~3: ~0.023)")

    for name, fn in (("reduce", gn_reduce), ("mxu", gn_mxu)):
        fwd = jax.jit(chain(fn, k))
        t = timed(fwd, x, iters)
        ms = t / k * 1e3
        print(f"fwd  {name:7s}: {ms:7.3f} ms/pass  "
              f"{bytes_pass / (t / k) / 1e9:6.1f} GB/s eff")
    for name, fn in (("reduce", gn_reduce), ("mxu", gn_mxu)):
        bwd = jax.jit(jax.grad(chain(fn, k)))
        t = timed(lambda v: jnp.sum(bwd(v).astype(jnp.float32)), x, iters)
        ms = t / k * 1e3
        print(f"f+b  {name:7s}: {ms:7.3f} ms/pass (fwd+bwd, per fwd-pass)")


if __name__ == "__main__":
    main()
