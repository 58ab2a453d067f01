"""Modern U-Net processor (wide residual blocks + optional spatial attention).

Capability parity with
``src/models/enc_proc_dec_components/proc_unet_modern.py`` (itself derived
from microsoft/pdearena): resolutions from ``ch_mults`` with ``n_blocks``
wide ResidualBlocks per resolution, strided-conv Downsample that downsamples
the broadcast conditioning grid in lockstep, MiddleBlock, UpBlocks consuming
skip connections with ``crop_nd`` shape alignment, transpose-conv Upsample,
conditioning concat at every block input, and a final norm+act+conv+crop.

Padding-mode semantics preserved exactly (see ``nps_tpu.models.common``):
- 'ones'    -> zero padding of 1 on k=3 convs (shapes preserved);
- 'circular'-> torch builds convs with padding=0 (padding_mode inert), i.e.
  VALID convs whose shapes are re-aligned by crop_nd zero-padding
  (``proc_unet_modern.py:74-83``); the Upsample transpose conv circular-pads
  by (k-1)//2 first (``models/common.py:93-120``).

TPU design: channels-last throughout; the skip/cond pyramids are static
Python lists (fixed architecture -> fully unrolled under jit, letting XLA
fuse the conv stacks).
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.common.interfaces import D, M
from nps_tpu.models.activations import resolve_activation
from nps_tpu.models.common import (ConvND, ConvTransposeND, Dense, crop_nd,
                                   group_norm)


# bench-only shape mock (tools/bench_align_ab.py): roles listed here get
# 'ones' geometry regardless of padding_mode, to measure the layout-alignment
# ceiling per U-Net region before building the exact aligned path. Empty in
# production — zero behavior change.
_MOCK_ONES_ROLES = set()


def _padding_kwargs(padding_mode, role=None):
    assert padding_mode in ("ones", "circular")
    if padding_mode == "ones" or role in _MOCK_ONES_ROLES:
        # zero padding of 1 (torch `padding=1`)
        return dict(padding=1, padding_mode="zeros")
    # torch passes padding_mode='circular' with padding=0 -> effectively VALID
    return dict(padding="valid", padding_mode="zeros")


class ResidualBlock(nn.Module):
    """Pre-activation wide residual block (``proc_unet_modern.py:199-250``)."""

    in_channels: int
    out_channels: int
    activation: Any = "gelu"
    norm: bool = False
    n_groups: int = 1
    num_spatial_dims: int = 1
    padding_mode: str = "ones"
    role: str = None  # bench mock tag only (see _MOCK_ONES_ROLES)

    @nn.compact
    def __call__(self, x):
        """x: a tensor or a tuple of channel-concat parts (norm stats are
        joint, convs use kernel slices — identical math to concatenating,
        but the wide tensor never materializes; see models/common.py)."""
        act = resolve_activation(self.activation)
        pk = _padding_kwargs(self.padding_mode, self.role)
        nd = self.num_spatial_dims

        def norm_layer(name):
            if self.norm:
                return lambda v: group_norm(v, self.n_groups, name=name)
            return lambda v: v

        def act_parts(v):
            return (tuple(act(p) for p in v) if isinstance(v, tuple)
                    else act(v))

        h = ConvND(self.out_channels, 3, nd, name="conv1", **pk)(
            act_parts(norm_layer("norm1")(x)))
        h = ConvND(self.out_channels, 3, nd, name="conv2", **pk)(
            act(norm_layer("norm2")(h)))
        if self.in_channels != self.out_channels:
            shortcut = ConvND(self.out_channels, 1, nd, padding="valid",
                              name="shortcut")(x)
        else:
            shortcut = (jnp.concatenate(x, axis=-1)
                        if isinstance(x, (tuple, list)) else x)
        return crop_nd(h, shortcut.shape, nd) + shortcut


class AttentionBlock(nn.Module):
    """Single-head spatial self-attention (``proc_unet_modern.py:253-317``).

    Note: reproduces the reference's softmax over the *query* axis
    (``attn.softmax(dim=1)`` on 'bijh') exactly.
    """

    in_channels: int
    n_heads: int = 1
    d_k: int = None
    n_groups: int = 1

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        sp = x.shape[1:-1]
        c = x.shape[-1]
        assert c == self.in_channels
        d_k = self.d_k or self.in_channels

        # the reference defines a GroupNorm here but never applies it
        # (proc_unet_modern.py:276 vs :292-317); materialize the unused
        # params so torch checkpoints with attention transplant cleanly
        # (XLA dead-code-eliminates the computation)
        _ = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5,
                         name="norm")(jax.lax.stop_gradient(
                             x.astype(jnp.float32)))

        h = x.reshape(b, -1, c)  # [b, seq, c]
        qkv = Dense(self.n_heads * d_k * 3, name="projection")(h)
        qkv = qkv.reshape(b, -1, self.n_heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bihd,bjhd->bijh", q, k,
                          preferred_element_type=jnp.float32) * (d_k ** -0.5)
        attn = jax_softmax_axis1(attn)
        res = jnp.einsum("bijh,bjhd->bihd", attn, v,
                         preferred_element_type=jnp.float32)
        res = res.reshape(b, -1, self.n_heads * d_k)
        res = Dense(self.in_channels, name="output")(res)
        res = res + h  # identity shortcut (in == out channels)
        return res.reshape(b, *sp, c)


def jax_softmax_axis1(x):
    import jax

    return jax.nn.softmax(x, axis=1)


class DownBlock(nn.Module):
    in_channels: int
    out_channels: int
    has_attn: bool = False
    activation: Any = "gelu"
    norm: bool = False
    num_spatial_dims: int = 1
    padding_mode: str = "ones"

    @nn.compact
    def __call__(self, x, variables_broadcast=None):
        if variables_broadcast is not None:
            x = jnp.concatenate([x, variables_broadcast], axis=-1)
        x = ResidualBlock(self.in_channels, self.out_channels,
                          activation=self.activation, norm=self.norm,
                          num_spatial_dims=self.num_spatial_dims,
                          padding_mode=self.padding_mode, role="down",
                          name="res")(x)
        if self.has_attn:
            x = AttentionBlock(self.out_channels, name="attn")(x)
        return x, variables_broadcast


class UpBlock(nn.Module):
    in_channels: int
    out_channels: int
    has_attn: bool = False
    activation: Any = "gelu"
    norm: bool = False
    num_spatial_dims: int = 1
    padding_mode: str = "ones"

    @nn.compact
    def __call__(self, x):
        # input channels include the concatenated skip (in + out)
        x = ResidualBlock(self.in_channels + self.out_channels,
                          self.out_channels, activation=self.activation,
                          norm=self.norm,
                          num_spatial_dims=self.num_spatial_dims,
                          padding_mode=self.padding_mode, role="up",
                          name="res")(x)
        if self.has_attn:
            x = AttentionBlock(self.out_channels, name="attn")(x)
        return x


class MiddleBlock(nn.Module):
    in_channels: int
    out_channels: int
    has_attn: bool = False
    activation: Any = "gelu"
    norm: bool = False
    num_spatial_dims: int = 1
    padding_mode: str = "ones"

    @nn.compact
    def __call__(self, x, variables_broadcast=None):
        if variables_broadcast is not None:
            x = jnp.concatenate([x, variables_broadcast], axis=-1)
        x = ResidualBlock(self.in_channels, self.out_channels,
                          activation=self.activation, norm=self.norm,
                          num_spatial_dims=self.num_spatial_dims,
                          padding_mode=self.padding_mode, role="mid",
                          name="res1")(x)
        if self.has_attn:
            x = AttentionBlock(self.out_channels, name="attn")(x)
        x = ResidualBlock(self.out_channels, self.out_channels,
                          activation=self.activation, norm=self.norm,
                          num_spatial_dims=self.num_spatial_dims,
                          padding_mode=self.padding_mode, role="mid",
                          name="res2")(x)
        return x, variables_broadcast


class Downsample(nn.Module):
    """k=3, s=2 conv; also downsamples the conditioning grid in lockstep."""

    n_channels: int
    num_spatial_dims: int
    n_cond: int
    padding_mode: str = "ones"

    @nn.compact
    def __call__(self, x, variables_broadcast=None):
        pk = _padding_kwargs(self.padding_mode, "downsample")
        nd = self.num_spatial_dims
        y = ConvND(self.n_channels, 3, nd, strides=2, name="conv", **pk)(x)
        if variables_broadcast is not None:
            vb = ConvND(self.n_cond, 3, nd, strides=2,
                        name="conv_variables_broadcast", **pk)(variables_broadcast)
            return y, vb
        return y, None


class Upsample(nn.Module):
    """2x upsample via transpose conv k=4, s=2 (``proc_unet_modern.py:425-436``)."""

    n_channels: int
    num_spatial_dims: int
    padding_mode: str = "ones"

    @nn.compact
    def __call__(self, x):
        nd = self.num_spatial_dims
        if self.padding_mode == "circular" and "upsample" not in _MOCK_ONES_ROLES:
            # ConvTranspose2d_padded: circular pad (k-1)//2 then transpose conv
            return ConvTransposeND(self.n_channels, 4, nd, strides=2,
                                   pre_pad=1, name="conv")(x)
        return ConvTransposeND(self.n_channels, 4, nd, strides=2,
                               name="conv")(x)


class UNetModern(nn.Module):
    """Modern U-Net (``proc_unet_modern.py:24-196``). Channels-last h in/out."""

    model_interface = M.AR_TB
    data_interface = (D.sim1d, D.sim2d, D.sim1d_var_t)

    pde: Any = None
    num_spatial_dims: int = 1
    n_cond: int = 0
    hidden_features: int = 128
    cond_mode: str = "concat"
    activation: Any = "gelu"
    norm: bool = False
    ch_mults: Sequence[int] = (1, 2, 2, 4)
    is_attn: Sequence[bool] = (False, False, False, False)
    mid_attn: bool = False
    n_blocks: int = 2
    use1x1: bool = False
    padding_mode: str = "ones"

    @nn.compact
    def __call__(self, h, variables_broadcast=None, pos=None):
        assert self.cond_mode in ("concat", None)
        n_cond = self.n_cond if self.cond_mode == "concat" else 0
        if self.cond_mode is None:
            variables_broadcast = None
        nd = self.num_spatial_dims
        assert h.ndim == 2 + nd, "expects [b, *spatial, c]"
        act = resolve_activation(self.activation)
        n_res = len(self.ch_mults)
        n_ch = self.hidden_features

        h_shape = h.shape
        h_feats = [h]
        vb_feats = [variables_broadcast]
        idx = 0

        # ---- down path ----
        out_ch = in_ch = n_ch
        for i in range(n_res):
            out_ch = in_ch * self.ch_mults[i]
            for _ in range(self.n_blocks):
                h, variables_broadcast = DownBlock(
                    in_ch + n_cond, out_ch, has_attn=self.is_attn[i],
                    activation=self.activation, norm=self.norm,
                    num_spatial_dims=nd, padding_mode=self.padding_mode,
                    name=f"down_{idx}")(h, variables_broadcast)
                idx += 1
                in_ch = out_ch
                h_feats.append(h)
                vb_feats.append(variables_broadcast)
            if i < n_res - 1:
                h, variables_broadcast = Downsample(
                    in_ch, nd, n_cond, padding_mode=self.padding_mode,
                    name=f"down_{idx}")(h, variables_broadcast)
                idx += 1
                h_feats.append(h)
                vb_feats.append(variables_broadcast)

        # ---- middle ----
        h, variables_broadcast = MiddleBlock(
            out_ch + n_cond, out_ch, has_attn=self.mid_attn,
            activation=self.activation, norm=self.norm, num_spatial_dims=nd,
            padding_mode=self.padding_mode, name="middle")(h, variables_broadcast)

        # ---- up path ----
        idx = 0
        in_ch = out_ch

        def skip_concat(h):
            s = crop_nd(h_feats.pop(), h.shape, nd)
            vb = vb_feats.pop()
            parts = [h, s]
            if vb is not None:
                parts.append(crop_nd(vb, h.shape, nd))
            return jnp.concatenate(parts, axis=-1)

        for i in reversed(range(n_res)):
            out_ch = in_ch
            for _ in range(self.n_blocks):
                h = skip_concat(h)
                h = UpBlock(in_ch + n_cond, out_ch, has_attn=self.is_attn[i],
                            activation=self.activation, norm=self.norm,
                            num_spatial_dims=nd,
                            padding_mode=self.padding_mode,
                            name=f"up_{idx}")(h)
                idx += 1
            out_ch = in_ch // self.ch_mults[i]
            h = skip_concat(h)
            h = UpBlock(in_ch + n_cond, out_ch, has_attn=self.is_attn[i],
                        activation=self.activation, norm=self.norm,
                        num_spatial_dims=nd, padding_mode=self.padding_mode,
                        name=f"up_{idx}")(h)
            idx += 1
            in_ch = out_ch
            if i > 0:
                h = Upsample(in_ch, nd, padding_mode=self.padding_mode,
                             name=f"up_{idx}")(h)
                idx += 1

        if self.norm:
            h = group_norm(h, 8, name="norm")
        h = act(h)
        if self.use1x1:
            h = ConvND(self.hidden_features, 1, nd, padding="valid",
                       name="final")(h)
        else:
            pk = _padding_kwargs(self.padding_mode, "final")
            h = ConvND(self.hidden_features, 3, nd, name="final", **pk)(h)
        return crop_nd(h, h_shape, nd)
