"""Pallas TPU kernel: fused truncated-DFT spectral convolution (2D forward).

The XLA path (``nps_tpu.ops.spectral``) lowers the five-stage DFT pipeline
to separate fusions with HBM round-trips for the intermediates. This kernel
keeps one batch element resident in VMEM and runs the full chain

    row truncated DFT -> col truncated DFT -> complex mode mix ->
    inverse col -> inverse row

with the bandwidth-heavy transforms as plain 2D MXU matmuls (Mosaic's dot
lowering wants 2D operands), every reshape a trailing-dim view (Mosaic
cannot reshape across the lane dimension), and the tiny per-mode channel
mix as an unrolled broadcast-multiply-reduce. Used for inference/rollout;
under differentiation a custom VJP falls back to the pure-jax DFT
formulation (identical math).

Grid: (batch,). Weights and DFT factor matrices are small and replicated
into VMEM for every program instance.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nps_tpu.ops import spectral as _spec


def _kernel(x_ref, c1t_ref, s1t_ref, c2_ref, s2_ref, ic2t_ref, is2t_ref,
            ic1t_ref, is1t_ref, w_ref, out_ref, *, n1, n2, m1, m2, ci, co,
            scale):
    x = x_ref[0].astype(jnp.float32)  # [n1, n2, ci]
    K = 2 * m1
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)

    # ---- stage 1: contract rows (x1) -> K row modes ----------------------
    xf = x.reshape(n1, n2 * ci)                 # trailing merge (view)
    bc = dot(c1t_ref[...], xf)                  # [K, n2*ci]
    bs = dot(s1t_ref[...], xf)
    # row spectrum R = bc - i*bs  (e^{-i t} = cos - i sin)

    # ---- stage 2: contract cols (y) -> m2 modes --------------------------
    r_re = jnp.transpose(bc.reshape(K, n2, ci), (0, 2, 1)).reshape(
        K * ci, n2)
    r_im = jnp.transpose(bs.reshape(K, n2, ci), (0, 2, 1)).reshape(
        K * ci, n2)                             # holds +bs (R_im = -bs)
    c2, s2 = c2_ref[...], s2_ref[...]
    # S = R @ (c2 - i s2) with R_re = bc, R_im = -bs:
    s_re = (dot(r_re, c2) - dot(r_im, s2)).reshape(K, ci, m2)
    s_im = (-dot(r_im, c2) - dot(r_re, s2)).reshape(K, ci, m2)

    # ---- stage 3 + 4: per-row-mode channel mix, then inverse col ---------
    # w_ref: [K, 2(re/im), ci, m2, co]; K static -> unrolled
    ic2t, is2t = ic2t_ref[...], is2t_ref[...]   # [n2, m2]
    t_res, t_ims = [], []
    for k in range(K):
        w_re = w_ref[k, 0]                      # [ci, m2, co]
        w_im = w_ref[k, 1]
        xr = s_re[k][:, :, None]                # [ci, m2, 1]
        xi = s_im[k][:, :, None]
        y_re = jnp.sum(xr * w_re - xi * w_im, axis=0)  # [m2, co]
        y_im = jnp.sum(xr * w_im + xi * w_re, axis=0)
        # inverse col transform: e^{+i t} with Hermitian doubling weights
        t_res.append(dot(ic2t, y_re) - dot(is2t, y_im))  # [n2, co]
        t_ims.append(dot(is2t, y_re) + dot(ic2t, y_im))

    t_re = jnp.concatenate(t_res, axis=0).reshape(K, n2 * co)
    t_im = jnp.concatenate(t_ims, axis=0).reshape(K, n2 * co)

    # ---- stage 5: inverse row transform ----------------------------------
    out = dot(ic1t_ref[...], t_re) - dot(is1t_ref[...], t_im)  # [n1, n2*co]
    out_ref[0] = (out.reshape(n1, n2, co) * scale).astype(out_ref.dtype)


def _round_up(v, m=128):
    return ((v + m - 1) // m) * m


def fits_vmem(x_shape, co, modes, budget_bytes=100 * 2 ** 20):
    """Whether the fully-resident kernel fits the VMEM window budget.

    The dominant allocation is the per-mode weight tensor
    [2m1, 2, ci_p, m2, co_p]; at production widths (192ch, 10 modes) this
    exceeds VMEM — a k-streamed variant (weights tiled over row modes with
    output revisiting) is the round-2 design. Until then large shapes fall
    back to the XLA DFT path.
    """
    b, n1, n2, ci = x_shape
    m1, m2 = modes
    ci_p, co_p = _round_up(ci), _round_up(co)
    w_bytes = 2 * m1 * 2 * ci_p * m2 * co_p * 4
    x_bytes = n1 * n2 * (ci_p + co_p) * 4
    return w_bytes + x_bytes < budget_bytes


def _forward(x, wr, wi, modes):
    m1, m2 = modes
    b, n1, n2, ci = x.shape
    co = wr.shape[1]

    if not fits_vmem(x.shape, co, modes):
        from nps_tpu.ops import spectral as spec

        w = jnp.stack([wr, wi])
        weights = [w[:, :, :, :m1], w[:, :, :, m1:]]
        return spec.spectral_conv_nd(x, weights, modes, mix_impl="dft")

    # Mosaic only supports lane-aligned vector reshapes: pad the channel
    # dims to multiples of 128 (zero channels contribute nothing)
    ci_p, co_p = _round_up(ci), _round_up(co)
    if ci_p != ci:
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, ci_p - ci)])
        wr = jnp.pad(wr, [(0, ci_p - ci), (0, 0), (0, 0), (0, 0)])
        wi = jnp.pad(wi, [(0, ci_p - ci), (0, 0), (0, 0), (0, 0)])
    if co_p != co:
        wr = jnp.pad(wr, [(0, 0), (0, co_p - co), (0, 0), (0, 0)])
        wi = jnp.pad(wi, [(0, 0), (0, co_p - co), (0, 0), (0, 0)])
    out = _forward_padded(x, wr, wi, modes)
    return out[..., :co]


def _forward_padded(x, wr, wi, modes):
    m1, m2 = modes
    b, n1, n2, ci = x.shape
    co = wr.shape[1]

    c2, s2 = (jnp.asarray(a) for a in _spec._dft_mats_fwd(n2, m2))
    c1, s1 = (jnp.asarray(a) for a in _spec._dft_mats_fwd_rows(n1, m1))
    ic2, is2 = (jnp.asarray(a) for a in _spec._dft_mats_inv_half(n2, m2))
    ic1, is1 = (jnp.asarray(a) for a in _spec._dft_mats_inv_rows(n1, m1))
    c1t, s1t = c1.T, s1.T            # [K, n1]
    ic2t, is2t = ic2.T, is2.T        # [n2, m2]
    ic1t, is1t = ic1.T, is1.T        # [n1, K]

    # weights regrouped per row mode: [K, 2, ci, m2, co]
    w = jnp.stack([wr, wi], axis=0)              # [2, ci, co, K, m2]
    w = jnp.transpose(w, (3, 0, 1, 4, 2))        # [K, 2, ci, m2, co]

    def full(r):
        return lambda i: (0,) * r

    out = pl.pallas_call(
        partial(_kernel, n1=n1, n2=n2, m1=m1, m2=m2, ci=ci, co=co,
                scale=1.0 / (n1 * n2)),
        out_shape=jax.ShapeDtypeStruct((b, n1, n2, co), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n1, n2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(m_.shape, full(2), memory_space=pltpu.VMEM)
              for m_ in (c1t, s1t, c2, s2, ic2t, is2t, ic1t, is1t)],
            pl.BlockSpec(w.shape, full(5), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n1, n2, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(x, c1t, s1t, c2, s2, ic2t, is2t, ic1t, is1t, w)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def spectral_dft_conv_2d_pallas(x, wr, wi, modes):
    """Fused 2D spectral conv. x: [b, n1, n2, ci]; wr/wi: [ci, co, 2m1, m2]
    (row blocks stacked, reference weights1 on top of weights2)."""
    return _forward(x, wr, wi, modes)


def _pallas_fwd(x, wr, wi, modes):
    return _forward(x, wr, wi, modes), (x, wr, wi)


def _pallas_bwd(modes, res, g):
    x, wr, wi = res
    m1, m2 = modes

    def ref_fn(x, wr, wi):
        w = jnp.stack([wr, wi])  # [2, ci, co, 2m1, m2]
        weights = [w[:, :, :, :m1], w[:, :, :, m1:]]
        return _spec.spectral_conv_nd(x, weights, modes, mix_impl="dft")

    _, vjp = jax.vjp(ref_fn, x, wr, wi)
    return vjp(g)


spectral_dft_conv_2d_pallas.defvjp(_pallas_fwd, _pallas_bwd)
