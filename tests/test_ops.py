"""Op-level parity tests.

Oracles:
- torch public primitives (conv/conv_transpose/pad/gelu) for geometry and
  numerics of the conv wrappers — the reference framework is built on these,
  so matching them transitively matches the reference;
- numpy complex FFT reference implementations for the spectral conv;
- hand-written numpy math for add_delta / volume preservation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nps_tpu.models.common import ConvND, ConvTransposeND, crop_nd
from nps_tpu.models.dec_grid import add_delta
from nps_tpu.models.activation_wrapper import volume_preserve
from nps_tpu.ops.spectral import spectral_conv_nd

TOL = dict(rtol=2e-5, atol=2e-5)


def torch_conv2d(x_nchw, w_oihw, b, stride=1, padding=0, dilation=1,
                 padding_mode="zeros"):
    xt = torch.tensor(x_nchw)
    wt = torch.tensor(w_oihw)
    bt = torch.tensor(b)
    if padding_mode == "circular" and padding != 0:
        if isinstance(padding, int):
            pad = (padding, padding, padding, padding)
        else:
            pad = (padding[1], padding[1], padding[0], padding[0])
        xt = F.pad(xt, pad, mode="circular")
        padding = 0
    return F.conv2d(xt, wt, bt, stride=stride, padding=padding,
                    dilation=dilation).numpy()


def apply_convnd(x_nchw, w_oihw, b, **kwargs):
    """Run ConvND (channels-last) with transplanted torch weights."""
    nd = x_nchw.ndim - 2
    mod = ConvND(features=w_oihw.shape[0], num_spatial_dims=nd,
                 kernel_size=w_oihw.shape[2:], **kwargs)
    x_cl = np.moveaxis(x_nchw, 1, -1)
    # torch [O, I, *k] -> [*k, I, O]
    w_cl = np.transpose(w_oihw, tuple(range(2, 2 + nd)) + (1, 0))
    params = {"params": {"kernel": jnp.array(w_cl), "bias": jnp.array(b)}}
    y = jax.jit(mod.apply)(params, jnp.array(x_cl))
    return np.moveaxis(np.asarray(y), -1, 1)


@pytest.mark.parametrize("padding,padding_mode,dilation,stride", [
    ("same", "zeros", 1, 1),
    ("same", "circular", 1, 1),
    ("same", "circular", 4, 1),   # DRN dilated circular
    ("valid", "zeros", 1, 1),     # UNet 'circular' mode (torch padding=0)
    (1, "zeros", 1, 1),           # UNet 'ones' mode
    (1, "zeros", 1, 2),           # Downsample geometry in 'ones' mode
    ("valid", "zeros", 1, 2),     # Downsample geometry in 'circular' mode
])
def test_convnd_matches_torch_conv2d(rng, padding, padding_mode, dilation, stride):
    x = rng.standard_normal((2, 3, 17, 12), dtype=np.float32)
    w = rng.standard_normal((5, 3, 3, 3), dtype=np.float32) * 0.3
    b = rng.standard_normal(5).astype(np.float32)

    if padding == "same":
        t_pad = (dilation * 2) // 2  # k=3 -> symmetric
        ref = torch_conv2d(x, w, b, stride=stride, padding=t_pad,
                           dilation=dilation, padding_mode=padding_mode)
    elif padding == "valid":
        ref = torch_conv2d(x, w, b, stride=stride, padding=0, dilation=dilation)
    else:
        ref = torch_conv2d(x, w, b, stride=stride, padding=padding,
                           dilation=dilation)

    out = apply_convnd(x, w, b, strides=stride, padding=padding,
                       padding_mode=padding_mode, dilation=dilation)
    np.testing.assert_allclose(out, ref, **TOL)


def test_convnd_1d_matches_torch(rng):
    x = rng.standard_normal((4, 2, 31), dtype=np.float32)
    w = rng.standard_normal((6, 2, 13), dtype=np.float32) * 0.2
    b = rng.standard_normal(6).astype(np.float32)
    ref = F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=2).numpy()
    out = apply_convnd(x, w, b, strides=2, padding="valid")
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.parametrize("pre_pad", [0, 1])
def test_conv_transpose_matches_torch(rng, pre_pad):
    x = rng.standard_normal((2, 4, 9, 7), dtype=np.float32)
    w = rng.standard_normal((4, 3, 4, 4), dtype=np.float32) * 0.3  # [I, O, k, k]
    b = rng.standard_normal(3).astype(np.float32)

    xt = torch.tensor(x)
    if pre_pad:
        xt = F.pad(xt, (pre_pad,) * 4, mode="circular")
    ref = F.conv_transpose2d(xt, torch.tensor(w), torch.tensor(b),
                             stride=2).numpy()

    mod = ConvTransposeND(features=3, kernel_size=4, num_spatial_dims=2,
                          strides=2, pre_pad=pre_pad)
    x_cl = np.moveaxis(x, 1, -1)
    w_cl = np.transpose(w, (2, 3, 0, 1))  # [I, O, kh, kw] -> [kh, kw, I, O]
    params = {"params": {"kernel": jnp.array(w_cl), "bias": jnp.array(b)}}
    out = np.moveaxis(np.asarray(jax.jit(mod.apply)(params, jnp.array(x_cl))), -1, 1)
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.parametrize("cur,des", [
    ((8, 8), (8, 8)),
    ((6, 5), (8, 8)),    # pad, odd diff
    ((10, 9), (8, 8)),   # crop, odd diff
    ((7, 10), (9, 8)),   # mixed pad/crop
])
def test_crop_nd_matches_reference_tiebreak(rng, cur, des):
    """Oracle: the reference's F.pad-based formula run through torch."""
    x = rng.standard_normal((2, 3) + cur, dtype=np.float32)

    pad_temp = np.repeat(np.subtract(des, cur) / 2, 2)
    breaking = np.tile([1, -1], len(pad_temp) // 2) / 1000
    pad = tuple(reversed(tuple(int(round(p)) for p in pad_temp + breaking)))
    ref = F.pad(torch.tensor(x), pad).numpy()

    x_cl = np.moveaxis(x, 1, -1)
    out = crop_nd(jnp.array(x_cl), (2,) + des + (3,), 2)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, **TOL)


def numpy_spectral_conv_2d(x_nchw, w1, w2, m1, m2):
    """Reference math: rfft2 -> complex einsum on corner blocks -> irfft2."""
    b, ci, n1, n2 = x_nchw.shape
    co = w1.shape[1]
    xf = np.fft.rfft2(x_nchw)
    out_ft = np.zeros((b, co, n1, n2 // 2 + 1), dtype=np.complex64)
    out_ft[:, :, :m1, :m2] = np.einsum("bixy,ioxy->boxy",
                                       xf[:, :, :m1, :m2], w1)
    out_ft[:, :, -m1:, :m2] = np.einsum("bixy,ioxy->boxy",
                                        xf[:, :, -m1:, :m2], w2)
    return np.fft.irfft2(out_ft, s=(n1, n2)).astype(np.float32)


def test_spectral_conv_2d_matches_numpy(rng):
    b, ci, co, n1, n2, m1, m2 = 3, 4, 5, 16, 12, 5, 4
    x = rng.standard_normal((b, ci, n1, n2), dtype=np.float32)
    w1 = (rng.random((ci, co, m1, m2)) + 1j * rng.random((ci, co, m1, m2))
          ).astype(np.complex64) * 0.1
    w2 = (rng.random((ci, co, m1, m2)) + 1j * rng.random((ci, co, m1, m2))
          ).astype(np.complex64) * 0.1

    ref = numpy_spectral_conv_2d(x, w1, w2, m1, m2)

    ws = [jnp.stack([jnp.array(w.real), jnp.array(w.imag)]) for w in (w1, w2)]
    x_cl = jnp.array(np.moveaxis(x, 1, -1))
    out = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1, m2)))(x_cl)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spectral_conv_1d_matches_numpy(rng):
    b, ci, co, n1, m1 = 2, 3, 4, 32, 9
    x = rng.standard_normal((b, ci, n1), dtype=np.float32)
    w1 = (rng.random((ci, co, m1)) + 1j * rng.random((ci, co, m1))
          ).astype(np.complex64) * 0.1
    xf = np.fft.rfft(x)
    out_ft = np.zeros((b, co, n1 // 2 + 1), dtype=np.complex64)
    out_ft[:, :, :m1] = np.einsum("bix,iox->box", xf[:, :, :m1], w1)
    ref = np.fft.irfft(out_ft, n=n1).astype(np.float32)

    ws = [jnp.stack([jnp.array(w1.real), jnp.array(w1.imag)])]
    out = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1,)))(
        jnp.array(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref,
                               rtol=1e-4, atol=1e-4)


def test_spectral_conv_3d_matches_numpy(rng):
    b, ci, co = 2, 2, 3
    n = (8, 8, 8)
    m = (2, 2, 3)
    x = rng.standard_normal((b, ci) + n, dtype=np.float32)
    ws_np = [(rng.random((ci, co) + m) + 1j * rng.random((ci, co) + m)
              ).astype(np.complex64) * 0.1 for _ in range(4)]
    xf = np.fft.rfftn(x, axes=(-3, -2, -1))
    out_ft = np.zeros((b, co, n[0], n[1], n[2] // 2 + 1), dtype=np.complex64)
    m1, m2, m3 = m
    out_ft[:, :, :m1, :m2, :m3] = np.einsum(
        "bixyz,ioxyz->boxyz", xf[:, :, :m1, :m2, :m3], ws_np[0])
    out_ft[:, :, -m1:, :m2, :m3] = np.einsum(
        "bixyz,ioxyz->boxyz", xf[:, :, -m1:, :m2, :m3], ws_np[1])
    out_ft[:, :, :m1, -m2:, :m3] = np.einsum(
        "bixyz,ioxyz->boxyz", xf[:, :, :m1, -m2:, :m3], ws_np[2])
    out_ft[:, :, -m1:, -m2:, :m3] = np.einsum(
        "bixyz,ioxyz->boxyz", xf[:, :, -m1:, -m2:, :m3], ws_np[3])
    ref = np.fft.irfftn(out_ft, s=n, axes=(-3, -2, -1)).astype(np.float32)

    ws = [jnp.stack([jnp.array(w.real), jnp.array(w.imag)]) for w in ws_np]
    out = jax.jit(lambda x: spectral_conv_nd(x, ws, m))(
        jnp.array(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref,
                               rtol=1e-4, atol=1e-4)


def test_add_delta_per_step(rng):
    b, c, tw, n1, n2 = 2, 1, 5, 6, 4
    delta = rng.standard_normal((b, c, tw, n1, n2), dtype=np.float32)
    u = rng.standard_normal((b, c, tw, n1, n2), dtype=np.float32)
    dt = 0.25
    dts = dt * np.arange(1, tw + 1, dtype=np.float32).reshape(1, 1, tw, 1, 1)
    ref = u[:, :, -1:] + dts * delta
    out = add_delta(jnp.array(delta), jnp.array(u), dt, tw, 2, "per_step")
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)
    out_all = add_delta(jnp.array(delta), jnp.array(u), dt, tw, 2, "all")
    np.testing.assert_allclose(np.asarray(out_all), u[:, :, -1:] + dt * delta, **TOL)
    out_none = add_delta(jnp.array(delta), jnp.array(u), dt, tw, 2, "none")
    np.testing.assert_allclose(np.asarray(out_none), delta, **TOL)


def _np_volume_preserve_individual_static(u, u_prev, max_pct):
    new = u.sum(axis=(3, 4))                       # [b, c, tw]
    prev = u_prev[:, :, -1].sum(axis=(2, 3))       # [b, c]
    tw = u.shape[2]
    prev_all = np.repeat(prev[:, :, None], tw, axis=2)
    max_all = max_pct * np.arange(1, tw + 1, dtype=u.dtype)
    dif = (1 - new / prev_all) * 100
    dif = np.tanh(dif / max_all) / 100 * max_all
    resc = 1 - dif
    return (u / new[..., None, None]) * (resc * prev_all)[..., None, None]


def test_volume_preserve_individual_static(rng):
    u = rng.random((2, 1, 4, 6, 5), dtype=np.float32) + 0.5
    u_prev = rng.random((2, 1, 4, 6, 5), dtype=np.float32) + 0.5
    ref = _np_volume_preserve_individual_static(u, u_prev, 1 / 25)
    out = volume_preserve(jnp.array(u), jnp.array(u_prev),
                          "individual_static", 1 / 25)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_volume_preserve_individual_matches_sequential(rng):
    """'individual' (lax.scan) must match a plain python sequential oracle."""
    u = rng.random((2, 1, 4, 6, 5), dtype=np.float32) + 0.5
    u_prev = rng.random((2, 1, 4, 6, 5), dtype=np.float32) + 0.5
    max_pct = 0.5
    new = u.sum(axis=(3, 4))
    prev = u_prev[:, :, -1].sum(axis=(2, 3))
    tw = u.shape[2]
    resc_all = np.zeros_like(new)
    prev_all = np.zeros_like(new)
    p = prev.copy()
    for i in range(tw):
        prev_all[:, :, i] = p
        dif = (1 - new[:, :, i] / p) * 100
        dif = np.tanh(dif / max_pct) / 100 * max_pct
        r = 1 - dif
        resc_all[:, :, i] = r
        p = r * p
    ref = (u / new[..., None, None]) * (resc_all * prev_all)[..., None, None]
    out = volume_preserve(jnp.array(u), jnp.array(u_prev), "individual", max_pct)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_volume_preserve_block(rng):
    u = rng.random((2, 2, 3, 4, 4), dtype=np.float32) + 0.5
    u_prev = rng.random((2, 2, 3, 4, 4), dtype=np.float32) + 0.5
    max_pct = 1.0
    new_mean = u.sum(axis=(3, 4)).mean(axis=2)
    prev = u_prev[:, :, -1].sum(axis=(2, 3))
    dif = (1 - new_mean / prev) * 100
    dif = np.tanh(dif / max_pct) / 100 * max_pct
    resc = 1 - dif
    ref = (u / new_mean[..., None, None, None]) * (prev * resc)[..., None, None, None]
    out = volume_preserve(jnp.array(u), jnp.array(u_prev), "block", max_pct)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_gelu_matches_torch_exact(rng):
    from nps_tpu.models.activations import GELU
    x = rng.standard_normal(1000, dtype=np.float32) * 3
    ref = F.gelu(torch.tensor(x)).numpy()
    out = np.asarray(GELU()(jnp.array(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["dft", "xla"])
def test_spectral_conv_impls_agree(rng, impl):
    b, ci, co, n1, n2, m1, m2 = 2, 3, 4, 16, 12, 4, 7  # m2 = n2//2+1 (Nyquist)
    x = rng.standard_normal((b, n1, n2, ci), dtype=np.float32)
    ws = [jnp.array(rng.random((2, ci, co, m1, m2)), dtype=jnp.float32) * 0.1
          for _ in range(2)]
    ref = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1, m2),
                                             mix_impl="xla"))(x)
    out = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1, m2),
                                             mix_impl=impl))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spectral_conv_1d_dft_vs_xla(rng):
    b, ci, co, n1, m1 = 2, 3, 4, 32, 17  # m1 = n1//2+1 incl Nyquist
    x = rng.standard_normal((b, n1, ci), dtype=np.float32)
    ws = [jnp.array(rng.random((2, ci, co, m1)), dtype=jnp.float32) * 0.1]
    ref = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1,), mix_impl="xla"))(x)
    out = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1,), mix_impl="dft"))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spectral_conv_retired_pallas_alias(rng):
    """mix_impl='pallas' is a retired route (BASELINE.md "Pallas verdict");
    it must resolve to the DFT path rather than error, so old configs keep
    working."""
    b, ci, co, n1, n2, m1, m2 = 2, 3, 4, 16, 16, 4, 5
    x = rng.standard_normal((b, n1, n2, ci), dtype=np.float32)
    ws = [jnp.array(rng.random((2, ci, co, m1, m2)), dtype=jnp.float32) * 0.1
          for _ in range(2)]
    ref = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1, m2),
                                             mix_impl="dft"))(x)
    out = jax.jit(lambda x: spectral_conv_nd(x, ws, (m1, m2),
                                             mix_impl="pallas"))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_adam_step_matches_torch(rng):
    """optax Adam via inject_hyperparams must match torch.optim.Adam
    (same bias correction, eps placement) over several steps."""
    from nps_tpu.train.optim import build_optimizer, set_learning_rate

    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.Adam([wt], lr=1e-3)
    for i, g in enumerate(grads):
        opt_t.zero_grad()
        wt.grad = torch.tensor(g)
        if i == 3:
            for group in opt_t.param_groups:
                group["lr"] = 4e-4
        opt_t.step()

    tx, _ = build_optimizer(object="optim.Adam", lr=1e-3)
    wj = jnp.array(w0)
    state = tx.init(wj)
    for i, g in enumerate(grads):
        if i == 3:
            state = set_learning_rate(state, 4e-4)
        upd, state = tx.update(jnp.array(g), state, wj)
        wj = wj + upd
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("groups,dtype", [(1, "float32"), (8, "float32"),
                                          (1, "bfloat16")])
def test_group_norm_fast_matches_flax(rng, groups, dtype):
    from flax import linen as nn
    from nps_tpu.models.common import GroupNormFast

    x = rng.standard_normal((2, 6, 5, 16), dtype=np.float32) * 3 + 1
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    params = {"params": {"scale": jnp.array(scale), "bias": jnp.array(bias)}}

    ref = nn.GroupNorm(num_groups=groups, epsilon=1e-5).apply(
        params, jnp.array(x))
    xj = jnp.array(x, dtype=dtype)
    out = GroupNormFast(num_groups=groups).apply(params, xj)
    assert out.dtype == xj.dtype
    tol = 1e-5 if dtype == "float32" else 3e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=tol, atol=tol)


@pytest.mark.parametrize("groups,dtype", [(1, "float32"), (4, "float32"),
                                          (1, "bfloat16")])
def test_group_norm_mxu_stats_match_reduce(rng, groups, dtype):
    """The MXU dot_general stats formulation (NPS_GN_STATS=mxu /
    set_gn_stats_impl) must match the default reduce formulation — both
    accumulate in f32, so they differ only by reduction order."""
    from nps_tpu.models import config as model_config
    from nps_tpu.models.common import GroupNormFast

    x = rng.standard_normal((2, 6, 5, 16), dtype=np.float32) * 3 + 1
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    params = {"params": {"scale": jnp.array(scale), "bias": jnp.array(bias)}}
    xj = jnp.array(x, dtype=dtype)

    assert model_config.gn_stats_impl() == "reduce"
    ref = GroupNormFast(num_groups=groups).apply(params, xj)
    model_config.set_gn_stats_impl("mxu")
    try:
        out = GroupNormFast(num_groups=groups).apply(params, xj)
    finally:
        model_config.set_gn_stats_impl("reduce")
    assert out.dtype == xj.dtype
    tol = 1e-5 if dtype == "float32" else 3e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_conv_and_groupnorm_parts_equal_concat(rng):
    """The parts-aware forms (kernel slices / joint stats) must equal the
    concatenated form exactly (kept for layout experiments; see BASELINE.md)."""
    from nps_tpu.models.common import ConvND, GroupNormFast

    a = rng.standard_normal((2, 9, 8, 5), dtype=np.float32)
    b = rng.standard_normal((2, 9, 8, 3), dtype=np.float32)
    cat = np.concatenate([a, b], axis=-1)

    conv = ConvND(6, 3, 2, padding="same", padding_mode="circular")
    p = conv.init(jax.random.PRNGKey(0), jnp.array(cat))
    y_cat = conv.apply(p, jnp.array(cat))
    y_parts = conv.apply(p, (jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(np.asarray(y_parts), np.asarray(y_cat),
                               rtol=1e-5, atol=1e-5)

    gn = GroupNormFast(num_groups=1)
    pg = gn.init(jax.random.PRNGKey(1), jnp.array(cat))
    g_cat = gn.apply(pg, jnp.array(cat))
    g_parts = gn.apply(pg, (jnp.array(a), jnp.array(b)))
    g_parts = np.concatenate([np.asarray(x) for x in g_parts], axis=-1)
    np.testing.assert_allclose(g_parts, np.asarray(g_cat),
                               rtol=1e-5, atol=1e-5)


def test_spectral_conv_rejects_overlapping_modes():
    """Both mix impls must reject mode counts beyond the (half) spectrum —
    the DFT matmuls would otherwise return finite wrong values."""
    import pytest
    from nps_tpu.ops.spectral import spectral_conv_nd

    x = np.zeros((1, 16, 12, 2), np.float32)
    w = [np.zeros((2, 2, 3, 2, 9), np.float32)] * 2
    for impl in ("dft", "xla"):
        with pytest.raises(ValueError, match="half spectrum"):
            spectral_conv_nd(x, w, (2, 9), mix_impl=impl)
    w_rows = [np.zeros((2, 2, 3, 9, 2), np.float32)] * 2
    for impl in ("dft", "xla"):
        with pytest.raises(ValueError, match="overlap"):
            spectral_conv_nd(x, w_rows, (9, 2), mix_impl=impl)
