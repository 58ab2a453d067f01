"""Shared model building blocks, channels-last (NHWC) for TPU.

Capability parity with ``src/models/common.py``: dimension-generic convs,
transpose convs with circular pre-padding, center crop/pad with the
reference's .5 tie-breaking (``common.py:20-34``), and the BCEncoder.

Design notes (TPU-first, not a port):
- all tensors are channels-last ``[b, *spatial, C]`` so convolutions map
  directly onto XLA's native TPU layout and the MXU;
- padding geometry reproduces the reference *exactly*, including the quirk
  that UNet "circular" mode builds convs with ``padding_mode='circular'``
  but ``padding=0`` — i.e. effectively VALID convs (torch only applies
  padding_mode when padding > 0); shapes are re-aligned by ``crop_nd``
  (``src/models/enc_proc_dec_components/proc_unet_modern.py:74-83,250``);
- ``padding='same'`` with ``padding_mode='circular'`` (used by DRN and
  FNO_Layer pointwise convs) *does* wrap-pad, implemented as jnp.pad
  (mode='wrap') + VALID conv.
"""

from typing import Any, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

from nps_tpu.models import initializers as init
from nps_tpu.models import config as model_config
from nps_tpu.models.activations import resolve_activation


def resolve_remat_policy(policy):
    """None -> full remat; 'save_conv_outputs' -> keep conv results and only
    recompute the cheap elementwise ops in the backward pass."""
    if policy is None:
        return None
    if policy == "save_conv_outputs":
        return jax.checkpoint_policies.save_only_these_names("conv_out")
    if callable(policy):
        return policy
    raise ValueError(f"Unknown remat policy {policy!r}")


def _parts(x):
    return x if isinstance(x, (tuple, list)) else (x,)


class GroupNormFast(nn.Module):
    """GroupNorm over the channel (last) axis with f32 statistics that never
    materializes an f32 copy of the activation tensor.

    flax's GroupNorm on a bf16 input either computes bf16 statistics (bad)
    or needs the input cast to f32 (materializing a full-size f32 tensor —
    measured at ~6% of the U-FNO step, and implicated in XLA's layout-copy
    churn). Here the convert fuses into the reductions (E[x], E[x^2] in
    f32), and the normalization runs in the input dtype with broadcast f32
    scalars. Matches torch/flax semantics (eps=1e-5, fast variance).
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        """x: a tensor, or a tuple of channel-concat *parts* — the parts form
        is normalized as if concatenated (shared statistics) but is returned
        part-wise, so the wide concat tensor never materializes (killing
        XLA's concat layout-copy churn on TPU)."""
        parts = _parts(x)
        c = sum(p.shape[-1] for p in parts)
        g = self.num_groups
        assert c % g == 0
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32),
                           (c,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32),
                          (c,))

        if len(parts) == 1 or g > 1:
            # grouped stats need the channel grouping -> materialize
            x = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=-1)
            xg = x.reshape(x.shape[:-1] + (g, c // g))
            red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
            if model_config.gn_stats_impl() == "mxu":
                # same f32-accumulated statistics as MXU contractions
                # (dot_general accumulates bf16 inputs in f32 natively);
                # see tools/bench_gn_stats.py for the A/B behind the knob
                b, cg = xg.shape[0], c // g
                s = int(np.prod(xg.shape[1:-2]))  # spatial extent
                x4 = xg.reshape(b, s, g, cg)
                n_el = s * cg
                ones = jnp.ones((s, cg), xg.dtype)
                s1 = jax.lax.dot_general(
                    x4, ones, (((1, 3), (0, 1)), ((), ())),
                    preferred_element_type=jnp.float32)      # [b, g]
                s2 = jax.lax.dot_general(
                    x4, x4, (((1, 3), (1, 3)), ((0, 2), (0, 2))),
                    preferred_element_type=jnp.float32)      # [b, g]
                stat_shape = (b,) + (1,) * (xg.ndim - 3) + (g, 1)
                mean = (s1 / n_el).reshape(stat_shape)
                mean2 = (s2 / n_el).reshape(stat_shape)
            else:
                if (model_config.fast_forward_active()
                        and xg.dtype == jnp.bfloat16):
                    # no-grad pushforward body: bf16 statistics (XLA's tree
                    # reduce; the output only seeds the next train window —
                    # see models.config.fast_forward_active)
                    xf = xg
                else:
                    xf = xg.astype(jnp.float32)  # fuses into the reductions
                mean = jnp.mean(xf, axis=red_axes, keepdims=True)
                mean2 = jnp.mean(jnp.square(xf), axis=red_axes,
                                 keepdims=True)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon)
            dt = x.dtype
            y = (xg - mean.astype(dt)) * inv.astype(dt)
            y = y.reshape(x.shape)
            return y * scale.astype(dt) + bias.astype(dt)

        # part-wise path (g == 1): joint statistics from per-part reduces
        b = parts[0].shape[0]
        n_el = sum(int(np.prod(p.shape[1:])) for p in parts)
        s1 = sum(jnp.sum(p.astype(jnp.float32),
                         axis=tuple(range(1, p.ndim))) for p in parts)
        s2 = sum(jnp.sum(jnp.square(p.astype(jnp.float32)),
                         axis=tuple(range(1, p.ndim))) for p in parts)
        mean = s1 / n_el                                     # [b]
        var = jnp.maximum(s2 / n_el - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        shape = (b,) + (1,) * (parts[0].ndim - 1)
        outs = []
        off = 0
        for p in parts:
            dt = p.dtype
            cp = p.shape[-1]
            y = (p - mean.reshape(shape).astype(dt)) * \
                inv.reshape(shape).astype(dt)
            outs.append(y * scale[off:off + cp].astype(dt) +
                        bias[off:off + cp].astype(dt))
            off += cp
        return tuple(outs)


def group_norm(x, num_groups, name=None):
    """GroupNorm with f32 statistics (torch eps=1e-5), output in the input's
    dtype; see GroupNormFast."""
    return GroupNormFast(num_groups=num_groups, name=name)(x)


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(int(x) for x in v)
    return (int(v),) * n


def crop_nd(x, target_shape, num_spatial_dims, channels_last=True):
    """Center crop/zero-pad the spatial dims of ``x`` to ``target_shape``.

    Reproduces reference ``crop_Nd`` semantics (``src/models/common.py:20-34``)
    including the .5 tie-break: for an odd size difference the *trailing* side
    receives the extra cell when padding, and the *leading* side loses the
    extra cell when cropping.
    """
    if hasattr(target_shape, "shape"):
        target_shape = target_shape.shape
    if channels_last:
        sp_axes = list(range(1, 1 + num_spatial_dims))
        s_des = tuple(target_shape[1:1 + num_spatial_dims])
    else:
        sp_axes = list(range(x.ndim - num_spatial_dims, x.ndim))
        s_des = tuple(target_shape[-num_spatial_dims:])

    pads = [(0, 0)] * x.ndim
    slices = [slice(None)] * x.ndim
    changed = False
    for ax, des in zip(sp_axes, s_des):
        cur = x.shape[ax]
        if cur == des:
            continue
        changed = True
        half = (des - cur) / 2.0
        lo = int(round(half - 0.001))
        hi = int(round(half + 0.001))
        if lo >= 0 and hi >= 0:
            pads[ax] = (lo, hi)
        elif lo <= 0 and hi <= 0:
            slices[ax] = slice(-lo, cur + hi if hi < 0 else cur)
        else:  # mixed (can't happen for same-sign diff, but be safe)
            slices[ax] = slice(max(0, -lo), cur + min(0, hi))
            pads[ax] = (max(0, lo), max(0, hi))
    if not changed:
        return x
    x = x[tuple(slices)]
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x


def circular_pad(x, pad_widths, num_spatial_dims):
    """Wrap-pad the spatial axes of a channels-last tensor.

    pad_widths: sequence of (lo, hi) per spatial dim.
    """
    assert x.ndim == num_spatial_dims + 2, "expects [b, *spatial, c]"
    pads = [(0, 0)] + list(pad_widths)[:num_spatial_dims] + [(0, 0)]
    return jnp.pad(x, pads, mode="wrap")


class ConvND(nn.Module):
    """Dimension-generic conv with torch-compatible geometry and init.

    padding: 'same' | 'valid' | int (symmetric zero pad)
    padding_mode: 'zeros' | 'circular' — only consulted for padding='same'
        (torch applies padding_mode only where implicit padding occurs; an
        int padding with circular mode is also honored, matching torch).
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    num_spatial_dims: int
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int] = "same"
    padding_mode: str = "zeros"
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: a tensor, or a tuple of channel-concat parts — convolving the
        parts with slices of the (single, transplant-compatible) kernel and
        summing is identical to convolving their concatenation, without
        materializing the wide tensor."""
        parts = _parts(x)
        nd = self.num_spatial_dims
        k = _tuple(self.kernel_size, nd)
        s = _tuple(self.strides, nd)
        d = _tuple(self.dilation, nd)
        in_ch = sum(p.shape[-1] for p in parts)

        kernel = self.param(
            "kernel", init.conv_kernel_init(nd), (*k, in_ch, self.features),
            jnp.float32)
        fan_in = int(np.prod(k)) * in_ch

        # resolve padding geometry
        if self.padding == "same":
            total = [(di * (ki - 1)) for ki, di in zip(k, d)]
            pad = [(t // 2, t - t // 2) for t in total]
        elif self.padding == "valid":
            pad = [(0, 0)] * nd
        elif isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * nd
        else:
            raise ValueError(f"Unsupported padding {self.padding!r}")

        wrap = (self.padding_mode == "circular"
                and any(p != (0, 0) for p in pad))
        if self.padding_mode not in ("zeros", "circular"):
            raise ValueError(f"Unsupported padding_mode {self.padding_mode!r}")

        dn = lax_conv_dims(nd)
        dtype = self.dtype or model_config.compute_dtype() or parts[0].dtype
        # in bf16 mode the conv emits bf16 (the MXU still accumulates f32 in
        # hardware); forcing preferred_element_type=f32 would break the VJP
        # with mixed-dtype cotangents
        preferred = jnp.float32 if dtype == jnp.float32 else None

        y = None
        off = 0
        for p in parts:
            cp = p.shape[-1]
            if wrap:
                p = circular_pad(p, pad, nd)
            kp = jax.lax.slice_in_dim(kernel, off, off + cp, axis=nd)
            yp = jax.lax.conv_general_dilated(
                p.astype(dtype), kp.astype(dtype),
                window_strides=s, padding=[(0, 0)] * nd if wrap else pad,
                rhs_dilation=d, dimension_numbers=dn,
                preferred_element_type=preferred,
            )
            y = yp if y is None else y + yp
            off += cp
        if self.use_bias:
            bias = self.param("bias", init.fan_in_bias_init(fan_in),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        # named for remat policies: "save conv outputs, recompute the cheap
        # elementwise ops" (see processors' remat_policy)
        return checkpoint_name(y, "conv_out")


class ConvTransposeND(nn.Module):
    """Torch-semantics transpose conv: out = (n-1)*stride + kernel (pad 0).

    Optional circular pre-padding reproduces ``ConvTranspose2d_padded``
    (``src/models/common.py:93-100``): wrap-pad by ``pre_pad`` cells per side
    *before* the transposed conv.

    Implementation: fractional striding via lhs_dilation + full correlation
    with the spatially-flipped kernel (mathematically identical to torch's
    gradient-of-conv formulation).
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    num_spatial_dims: int
    strides: Union[int, Sequence[int]] = 1
    pre_pad: int = 0  # circular padding applied before the transpose conv
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        nd = self.num_spatial_dims
        k = _tuple(self.kernel_size, nd)
        s = _tuple(self.strides, nd)
        in_ch = x.shape[-1]

        # stored like torch [I, O, *k] flattened to [*k, I, O] layout? keep
        # [*k, I, O]; fan_in = out_ch * prod(k) to match torch ConvTranspose.
        kernel = self.param(
            "kernel", init.conv_transpose_kernel_init(nd),
            (*k, in_ch, self.features), jnp.float32)

        if self.pre_pad > 0:
            x = circular_pad(x, [(self.pre_pad, self.pre_pad)] * nd, nd)

        w = jnp.flip(kernel, axis=tuple(range(nd)))
        dn = lax_conv_dims(nd)
        dtype = self.dtype or model_config.compute_dtype() or x.dtype
        preferred = jnp.float32 if dtype == jnp.float32 else None
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype),
            window_strides=(1,) * nd,
            padding=[(ki - 1, ki - 1) for ki in k],
            lhs_dilation=s,
            dimension_numbers=dn,
            preferred_element_type=preferred,
        )
        if self.use_bias:
            fan_in = int(np.prod(k)) * self.features
            bias = self.param("bias", init.fan_in_bias_init(fan_in),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def lax_conv_dims(num_spatial_dims):
    sp = "".join("DHW"[3 - num_spatial_dims + i] for i in range(num_spatial_dims))
    return jax.lax.conv_dimension_numbers(
        (1,) * (num_spatial_dims + 2), (1,) * (num_spatial_dims + 2),
        (f"N{sp}C", f"{sp}IO", f"N{sp}C"))


class Dense(nn.Module):
    """Linear layer with torch-default init; input [..., in] -> [..., out]."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", init.linear_kernel_init(),
                            (in_ch, self.features), jnp.float32)
        dtype = model_config.compute_dtype() or x.dtype
        preferred = jnp.float32 if dtype == jnp.float32 else None
        y = jnp.einsum("...i,io->...o", x.astype(dtype),
                       kernel.astype(dtype),
                       preferred_element_type=preferred)
        if self.use_bias:
            bias = self.param("bias", init.fan_in_bias_init(in_ch),
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, torch eps=1e-5."""

    num_groups: int

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                            use_bias=True, use_scale=True)(x)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


class BCEncoder(nn.Module):
    """Encode a boundary-condition signal [b, c_bc, tw] to [b, n_out].

    Parity: ``src/models/common.py:123-150`` — conv stack over the time axis
    followed by flatten + Linear(time_window * hidden -> out).
    """

    bc_encoder_in: int
    bc_encoder_out: int
    bc_encoder_hidden: int
    bc_encoder_kernel: int
    time_window: int
    num_spatial_dims: int = 1
    activation: Any = "gelu"
    bc_encoder_n_hidden: int = 1

    @property
    def n_out(self):
        return self.bc_encoder_out

    @nn.compact
    def __call__(self, x):
        act = resolve_activation(self.activation)
        # x arrives channel-first [b, c_bc, tw]; convs run channels-last.
        h = jnp.swapaxes(x, 1, 2)  # [b, tw, c_bc]
        h = ConvND(self.bc_encoder_hidden, self.bc_encoder_kernel, 1,
                   padding="same", padding_mode="zeros", name="conv_in")(h)
        h = act(h)
        for i in range(self.bc_encoder_n_hidden):
            h = ConvND(self.bc_encoder_hidden, self.bc_encoder_kernel, 1,
                       padding="same", padding_mode="zeros",
                       name=f"conv_h{i}")(h)
            h = act(h)
        # torch flattens [b, hidden, tw] C-order -> channel-major; match it.
        h = jnp.swapaxes(h, 1, 2).reshape(h.shape[0], -1)
        return Dense(self.bc_encoder_out, name="out")(h)
