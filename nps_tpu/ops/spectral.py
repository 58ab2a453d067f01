"""Mode-truncated spectral convolution (the FNO/U-FNO hot op), TPU-first.

Math parity with ``src/models/enc_proc_dec_components/proc_fno.py:158-376``:
rfft over the spatial dims, complex per-mode channel mixing on the retained
low-frequency corner blocks (1 block in 1D, 2 in 2D, 4 in 3D), zero
elsewhere, irfft back to the input spatial size.

TPU-first design decisions (deliberately *not* a translation):
- channels-last layout [b, *spatial, C];
- complex weights stored split as [2(re/im), i, o, *modes] — TPU has no
  native complex MXU path, so the complex contraction runs as four real
  einsums (batched matmuls over the mode axes) with float32 accumulation;
- the corner blocks are *gathered* (slice + concat) rather than scattered
  into a zero-filled spectrum, so XLA sees static dense ops;
- FFT itself stays on XLA's native FFT (fusing FFT into Pallas is not a
  win; see SURVEY.md §7).

A hand-written Pallas route was built, benchmarked, and RETIRED: the fused
single-kernel spectral conv lost 24x to these XLA matmuls at 64ch and its
production weights (60 MB at 192ch) exceed VMEM; the XLA DFT path measures
within ~2.5x of pure HBM bandwidth (BASELINE.md "Pallas verdict"). Valid
``mix_impl`` values are 'dft' (default, truncated-DFT matmuls) and 'xla'
(full FFT; used by the 3D path).
"""

from functools import lru_cache, partial

import numpy as np
import jax.numpy as jnp


def _complex_mix(blk, w, film=None, film_mode=1, precision=None):
    """Per-mode complex channel mixing.

    blk: complex [b, *modeshape, i]
    w:   real    [2, i, o, *modeshape]
    film: optional real [b, o, *modeshape] FiLM scaling
    returns complex [b, *modeshape, o]
    """
    wr, wi = w[0], w[1]
    br, bi = jnp.real(blk), jnp.imag(blk)
    nd = wr.ndim - 2  # number of mode axes
    mode_axes = "xyz"[:nd]
    eq = f"b{mode_axes}i,io{mode_axes}->b{mode_axes}o"
    ein = partial(jnp.einsum, eq, preferred_element_type=jnp.float32,
                  precision=precision)
    yr = ein(br, wr) - ein(bi, wi)
    yi = ein(br, wi) + ein(bi, wr)
    if film is not None:
        # film arrives [b, o, *modes]; move o last
        f = jnp.moveaxis(film, 1, -1)
        if film_mode == 0:
            f = 1.0 + f
        yr = yr * f
        yi = yi * f
    return yr + 1j * yi


@lru_cache(maxsize=None)
def _dft_mats_fwd(n, m):
    """Truncated forward DFT factors: e^{-2pi i k x / n} for k < m.
    Returns (cos, sin) as [n, m] float32."""
    k = np.arange(m)
    x = np.arange(n)
    ang = 2.0 * np.pi * np.outer(x, k) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@lru_cache(maxsize=None)
def _dft_mats_fwd_rows(n, m):
    """Forward DFT factors for the low+high row blocks: k in
    [0..m-1] u [n-m..n-1]. Returns (cos, sin) as [n, 2m]."""
    ks = np.concatenate([np.arange(m), np.arange(n - m, n)])
    x = np.arange(n)
    ang = 2.0 * np.pi * np.outer(x, ks) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@lru_cache(maxsize=None)
def _dft_mats_inv_half(n, m):
    """Inverse factors for the rfft (half-spectrum) axis with Hermitian
    doubling: weight 1 for k=0, 2 for 0<k<n/2. Returns (cos, sin) [m, n]."""
    k = np.arange(m)
    y = np.arange(n)
    w = np.where((k == 0) | ((n % 2 == 0) & (k == n // 2)), 1.0, 2.0)[:, None]
    ang = 2.0 * np.pi * np.outer(k, y) / n
    return ((w * np.cos(ang)).astype(np.float32),
            (w * np.sin(ang)).astype(np.float32))


@lru_cache(maxsize=None)
def _dft_mats_inv_rows(n, m):
    """Inverse factors for the full-spectrum row axis at the retained
    low+high blocks. Returns (cos, sin) [2m, n]."""
    ks = np.concatenate([np.arange(m), np.arange(n - m, n)])
    x = np.arange(n)
    ang = 2.0 * np.pi * np.outer(ks, x) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _spectral_conv_2d_dft(x, weights, modes, film, film_mode, precision):
    """FFT-free truncated spectral conv: the rfft2 -> corner-block complex
    mix -> irfft2 pipeline collapsed into small dense DFT contractions.

    With m1, m2 << n1, n2 (e.g. 10 modes on a 128^2 grid) the full FFT
    wastes HBM bandwidth materializing [b, n1, n2/2+1, c] complex
    spectra that are immediately truncated / zero-filled. Computing only
    the retained modes as matmuls keeps all work on the MXU:
        forward:  X[k1,k2] = sum_{x,y} e^{-2pi i(k1 x/n1)} e^{-2pi i(k2 y/n2)} u[x,y]
        inverse:  u[x,y]   = 1/(n1 n2) * Re sum_{k1,k2} w(k2) e^{+...} Y[k1,k2]
    Mathematically identical to the reference's rfft2/irfft2 formulation.
    """
    from nps_tpu.models import config as model_config

    m1, m2 = modes
    b, n1, n2, ci = x.shape
    co = weights[0].shape[2]
    dt = model_config.compute_dtype() or jnp.float32

    preferred = jnp.float32 if dt == jnp.float32 else None

    def ein(eq, a, b_):
        return jnp.einsum(eq, a.astype(dt), b_.astype(dt),
                          preferred_element_type=preferred,
                          precision=precision)

    x = x.astype(dt)
    c2, s2 = (jnp.asarray(a) for a in _dft_mats_fwd(n2, m2))
    c1, s1 = (jnp.asarray(a) for a in _dft_mats_fwd_rows(n1, m1))

    # stage A: contract the rfft axis (y) -> m2 modes
    re2 = ein("bxyc,ym->bxmc", x, c2)
    im2 = -ein("bxyc,ym->bxmc", x, s2)
    # stage B: contract rows (x) -> 2*m1 retained row modes
    # e^{-i t}(re + i im) = (re cos + im sin) + i (im cos - re sin)
    x_re = ein("bxmc,xk->bkmc", re2, c1) + ein("bxmc,xk->bkmc", im2, s1)
    x_im = ein("bxmc,xk->bkmc", im2, c1) - ein("bxmc,xk->bkmc", re2, s1)

    # complex per-mode channel mix on the stacked blocks [b, 2m1, m2, *]
    w = jnp.concatenate([weights[0], weights[1]], axis=3)  # [2, i, o, 2m1, m2]
    wr, wi = w[0], w[1]
    mix = partial(ein, "bkmi,iokm->bkmo")
    y_re = mix(x_re, wr) - mix(x_im, wi)
    y_im = mix(x_re, wi) + mix(x_im, wr)
    if film is not None:
        f = jnp.moveaxis(film[:, :, :2 * m1, :m2], 1, -1).astype(dt)
        if film_mode == 0:
            f = (1.0 + f).astype(dt)
        y_re = y_re * f
        y_im = y_im * f

    # inverse: half axis (y) with Hermitian doubling, then row axis (x)
    ic2, is2 = (jnp.asarray(a) for a in _dft_mats_inv_half(n2, m2))
    ic1, is1 = (jnp.asarray(a) for a in _dft_mats_inv_rows(n1, m1))
    # e^{+i t}(re + i im) = (re cos - im sin) + i (re sin + im cos)
    t_re = ein("bkmo,my->bkyo", y_re, ic2) - ein("bkmo,my->bkyo", y_im, is2)
    t_im = ein("bkmo,my->bkyo", y_re, is2) + ein("bkmo,my->bkyo", y_im, ic2)
    out = ein("bkyo,kx->bxyo", t_re, ic1) - ein("bkyo,kx->bxyo", t_im, is1)
    return out / (n1 * n2)


def _spectral_conv_1d_dft(x, weights, modes, film, film_mode, precision):
    (m1,) = modes
    b, n1, ci = x.shape
    ein = partial(jnp.einsum, preferred_element_type=jnp.float32,
                  precision=precision)
    c1, s1 = (jnp.asarray(a) for a in _dft_mats_fwd(n1, m1))
    x_re = ein("bxc,xm->bmc", x, c1)
    x_im = -ein("bxc,xm->bmc", x, s1)
    w = weights[0]
    mix = partial(jnp.einsum, "bmi,iom->bmo",
                  preferred_element_type=jnp.float32, precision=precision)
    y_re = mix(x_re, w[0]) - mix(x_im, w[1])
    y_im = mix(x_re, w[1]) + mix(x_im, w[0])
    if film is not None:
        f = jnp.moveaxis(film[:, :, :m1], 1, -1)
        if film_mode == 0:
            f = 1.0 + f
        y_re = y_re * f
        y_im = y_im * f
    ic1, is1 = (jnp.asarray(a) for a in _dft_mats_inv_half(n1, m1))
    out = ein("bmo,mx->bxo", y_re, ic1) - ein("bmo,mx->bxo", y_im, is1)
    return out / n1


def spectral_conv_nd(x, weights, modes, film=None, film_mode=1,
                     num_spatial_dims=None, mix_impl="dft", precision=None):
    """Apply a mode-truncated spectral conv.

    Args:
        x: [b, *spatial, Ci] real float array.
        weights: list of split-complex weight arrays [2, Ci, Co, *modes];
            length 1 (1D), 2 (2D: low/high rows), or 4 (3D corner blocks),
            matching the reference's weights1..weights4.
        modes: tuple of per-dim retained mode counts.
        film: optional FiLM scaling, [b, Co, n_blocks*m1(*...), m_last]
            laid out exactly like the reference's FiLM weight grids.
        film_mode: 0 -> multiply by (1 + w); 1 -> multiply by w.
        mix_impl: 'dft' (truncated-DFT matmuls, default) or 'xla' (FFT).
    Returns:
        [b, *spatial, Co] real float array.
    """
    nd = num_spatial_dims or (x.ndim - 2)
    sp_axes = tuple(range(1, 1 + nd))
    sp = x.shape[1:1 + nd]
    b = x.shape[0]
    co = weights[0].shape[2]

    # validate on EVERY path: the truncated-DFT matmuls would otherwise
    # return finite wrong values (Hermitian doubling is only defined for
    # modes within the half spectrum) where the FFT path would assert
    if modes[-1] > sp[-1] // 2 + 1:
        raise ValueError(
            f"modes[-1]={modes[-1]} exceeds the half spectrum "
            f"{sp[-1] // 2 + 1} of the last spatial dim {sp[-1]}")
    for d in range(nd - 1):
        if 2 * modes[d] > sp[d]:
            raise ValueError(
                f"2*modes[{d}]={2 * modes[d]} exceeds spatial dim {sp[d]}: "
                f"the low/high mode blocks overlap the spectrum")

    if mix_impl == "pallas":  # retired route (see module docstring)
        mix_impl = "dft"

    if mix_impl == "dft":
        # FFT-free path (default): exact truncated-DFT matmuls on the MXU
        x32 = x.astype(jnp.float32)
        if nd == 1:
            return _spectral_conv_1d_dft(x32, weights, modes, film, film_mode,
                                         precision)
        if nd == 2:
            assert 2 * modes[0] <= sp[0], "mode blocks overlap the spectrum"
            return _spectral_conv_2d_dft(x32, weights, modes, film, film_mode,
                                         precision)
        mix_impl = "xla"  # 3D falls back to the FFT path

    x32 = x.astype(jnp.float32)
    xf = jnp.fft.rfftn(x32, axes=sp_axes)  # complex64, half spectrum on last sp dim

    def mix(blk, w, f):
        return _complex_mix(blk, w, f, film_mode, precision)

    if nd == 1:
        (m1,) = modes
        n1 = sp[0]
        nf = n1 // 2 + 1
        blk = xf[:, :m1, :]
        f = film[:, :, :m1] if film is not None else None  # [b, o, m1]
        out = mix(blk, weights[0], f)  # [b, m1, o]
        out_ft = jnp.concatenate(
            [out, jnp.zeros((b, nf - m1, co), out.dtype)], axis=1)
        return jnp.fft.irfft(out_ft, n=n1, axis=1)

    if nd == 2:
        m1, m2 = modes
        n1, n2 = sp
        nf2 = n2 // 2 + 1
        assert 2 * m1 <= n1 and m2 <= nf2, "mode blocks overlap the spectrum"
        top = xf[:, :m1, :m2, :]
        bot = xf[:, n1 - m1:, :m2, :]
        blk = jnp.concatenate([top, bot], axis=1)       # [b, 2*m1, m2, i]
        w = jnp.concatenate([weights[0], weights[1]], axis=3)  # [2,i,o,2*m1,m2]
        f = film[:, :, :2 * m1, :m2] if film is not None else None
        out = mix(blk, w, f)                            # [b, 2*m1, m2, o]
        top_o, bot_o = out[:, :m1], out[:, m1:]
        mid = jnp.zeros((b, n1 - 2 * m1, m2, co), out.dtype)
        col = jnp.concatenate([top_o, mid, bot_o], axis=1)     # [b, n1, m2, o]
        right = jnp.zeros((b, n1, nf2 - m2, co), out.dtype)
        out_ft = jnp.concatenate([col, right], axis=2)
        return jnp.fft.irfftn(out_ft, s=(n1, n2), axes=(1, 2))

    if nd == 3:
        m1, m2, m3 = modes
        n1, n2, n3 = sp
        nf3 = n3 // 2 + 1
        assert 2 * m1 <= n1 and 2 * m2 <= n2 and m3 <= nf3
        if film is not None:
            raise NotImplementedError(
                "FiLM conditioning for 3D spectral convs is not supported "
                "(the reference implementation is inconsistent here; "
                "proc_fno.py:352-372)")
        c00 = xf[:, :m1, :m2, :m3, :]
        c10 = xf[:, n1 - m1:, :m2, :m3, :]
        c01 = xf[:, :m1, n2 - m2:, :m3, :]
        c11 = xf[:, n1 - m1:, n2 - m2:, :m3, :]
        outs = [mix(c, w, None)
                for c, w in zip([c00, c10, c01, c11], weights)]
        z1 = jnp.zeros((b, n1 - 2 * m1, m2, m3, co), outs[0].dtype)
        colL = jnp.concatenate([outs[0], z1, outs[1]], axis=1)  # [b,n1,m2,m3,o]
        colR = jnp.concatenate([outs[2], z1, outs[3]], axis=1)
        z2 = jnp.zeros((b, n1, n2 - 2 * m2, m3, co), outs[0].dtype)
        plane = jnp.concatenate([colL, z2, colR], axis=2)       # [b,n1,n2,m3,o]
        z3 = jnp.zeros((b, n1, n2, nf3 - m3, co), outs[0].dtype)
        out_ft = jnp.concatenate([plane, z3], axis=3)
        return jnp.fft.irfftn(out_ft, s=(n1, n2, n3), axes=(1, 2, 3))

    raise NotImplementedError(f"spectral conv for {nd}D not implemented")
