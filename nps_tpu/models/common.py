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


def group_norm(x, num_groups, name=None):
    """GroupNorm with f32 statistics regardless of the activation dtype
    (torch eps=1e-5); output returned in the input's dtype."""
    orig = x.dtype
    y = nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, name=name)(
        x.astype(jnp.float32))
    return y.astype(orig)


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
        nd = self.num_spatial_dims
        k = _tuple(self.kernel_size, nd)
        s = _tuple(self.strides, nd)
        d = _tuple(self.dilation, nd)
        in_ch = x.shape[-1]

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

        if self.padding_mode == "circular" and any(p != (0, 0) for p in pad):
            x = circular_pad(x, pad, nd)
            pad = [(0, 0)] * nd
        elif self.padding_mode not in ("zeros", "circular"):
            raise ValueError(f"Unsupported padding_mode {self.padding_mode!r}")

        dn = lax_conv_dims(nd)
        dtype = self.dtype or model_config.compute_dtype() or x.dtype
        # in bf16 mode the conv emits bf16 (the MXU still accumulates f32 in
        # hardware); forcing preferred_element_type=f32 would break the VJP
        # with mixed-dtype cotangents
        preferred = jnp.float32 if dtype == jnp.float32 else None
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=s, padding=pad, rhs_dilation=d,
            dimension_numbers=dn,
            preferred_element_type=preferred,
        )
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
