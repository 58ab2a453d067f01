"""NON-PRODUCTION EVIDENCE ARTIFACT — retired Pallas kernel.

This kernel was built, benchmarked, and retired in round 2 (BASELINE.md
"Pallas verdict": XLA's fused GN beat it on the real chip). It is kept in
tools/ solely as the measured artifact behind that decision; nothing in
nps_tpu imports it.

Fused single-pass GroupNorm (num_groups=1) as a Pallas TPU kernel.

XLA compiles the two-moment GroupNorm into two separate reduce fusions plus
a normalize pass — three full HBM reads of the activation tensor per
forward (measured ~15% of the U-FNO train step at 128^2, reference
semantics ``src/models/enc_proc_dec_components/proc_unet_modern.py:214``).
This kernel keeps one batch element's field VMEM-resident and does
stats + normalize + affine in ONE HBM read + ONE write; the custom VJP
backward likewise fuses the three reduction terms (sum(dy), sum(dy*xhat),
and the per-element dx) into a single read of (x, dy).

Forward math matches GroupNormFast/torch exactly in f32 (eps inside
rsqrt, biased variance); in bf16 mode statistics stay f32.

Layout contract: channels-last ``[b, *spatial, C]``; only num_groups == 1
(the hot case — every UNet ResidualBlock norm) is handled; callers fall
back to the XLA path otherwise.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 2 ** 20


def _interpret():
    return jax.default_backend() == "cpu"


def _fwd_kernel(eps, x_ref, g_ref, b_ref, y_ref, stats_ref):
    xf = x_ref[0].astype(jnp.float32)            # [S, C], one batch element
    n = float(np.prod(xf.shape))
    s1 = jnp.sum(xf)
    s2 = jnp.sum(xf * xf)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gam = g_ref[0].astype(jnp.float32)           # [C]
    bet = b_ref[0].astype(jnp.float32)
    y = ((xf - mean) * inv) * gam[None, :] + bet[None, :]
    y_ref[0] = y.astype(y_ref.dtype)
    i = pl.program_id(0)
    stats_ref[i, 0] = mean
    stats_ref[i, 1] = inv


def _run_fwd(x3, scale, bias, eps):
    b, s, c = x3.shape
    return pl.pallas_call(
        partial(_fwd_kernel, eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(x3, scale[None, :], bias[None, :])


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def group_norm_pallas(x, scale, bias, eps=1e-5):
    """GroupNorm(num_groups=1) over a channels-last field, fused.

    x: [b, *spatial, C]; scale/bias: [C] f32. Returns x-dtype output.
    """
    y, _ = _gn_fwd_impl(x, scale, bias, eps)
    return y


def _gn_fwd_impl(x, scale, bias, eps):
    shape = x.shape
    x3 = x.reshape(shape[0], -1, shape[-1])
    y, stats = _run_fwd(x3, scale, bias, eps)
    return y.reshape(shape), stats


def _gn_fwd(x, scale, bias, eps):
    y, stats = _gn_fwd_impl(x, scale, bias, eps)
    return y, (x, scale, stats)


def _gn_bwd(eps, res, dy):
    """XLA backward (the standard GN-vjp formulas): XLA's fused reduces are
    already near HBM bandwidth here, and a Pallas backward needs (x, dy, dx)
    triple-buffered in VMEM, which exceeds the budget at 132^2 x 388ch. The
    Pallas win is the forward's single fused pass."""
    x, scale, stats = res
    red = tuple(range(1, x.ndim - 1)) + (x.ndim - 1,)
    bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
    n = float(np.prod(x.shape[1:]))
    mean = stats[:, 0].reshape(bshape)
    inv = stats[:, 1].reshape(bshape)
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * inv
    t = dyf * scale.astype(jnp.float32)
    a = (jnp.sum(t, axis=red) / n).reshape(bshape)
    c = (jnp.sum(t * xhat, axis=red) / n).reshape(bshape)
    dx = (inv * (t - a - xhat * c)).astype(x.dtype)
    bred = (0,) + tuple(range(1, x.ndim - 1))
    dg = jnp.sum(dyf * xhat, axis=bred)
    db = jnp.sum(dyf, axis=bred)
    return dx, dg, db


group_norm_pallas.defvjp(_gn_fwd, _gn_bwd)


def supported(x, num_groups):
    """The kernel handles num_groups==1 on >=1 spatial dims with a VMEM
    budget for one batch element's field (doubled for pipelining)."""
    if num_groups != 1 or x.ndim < 3:
        return False
    c_pad = -(-x.shape[-1] // 128) * 128
    per_block = int(np.prod(x.shape[1:-1])) * c_pad * x.dtype.itemsize
    return 4 * per_block <= _VMEM_LIMIT  # in+out, double-buffered
