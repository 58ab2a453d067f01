"""FNO processor: stacked spectral-conv layers with pointwise-conv bypass.

Capability parity with ``src/models/enc_proc_dec_components/proc_fno.py``:
- ``FNO``: ``hidden_blocks`` x ``FNO_Layer``; conditioning either by FiLM on
  the spectrum (``cond_mode='film'``) or channel-concat of the broadcast
  conditioning grid (``cond_mode='concat'``, used by all twophase configs);
- ``FNO_Layer``: SpectralConv + parallel pointwise conv ('single') or two
  convs ('double'), summed, activation (GELU by default; disabled inside
  U-FNO) — ``proc_fno.py:87-155``;
- ``SpectralConvND``: complex mode-truncated spectral convolution with
  weights ``weights1..weights4`` (see ``nps_tpu.ops.spectral``).

TPU design: channels-last, split-complex weights, mode asserts are
construction/trace-time (shapes are static under jit).
"""

from typing import Any, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.common.interfaces import D, M
from nps_tpu.models import initializers as init
from nps_tpu.models.activations import resolve_activation
from nps_tpu.models.common import ConvND, Dense
from nps_tpu.ops.spectral import spectral_conv_nd


def _modes_tuple(modes, nd):
    if isinstance(modes, int):
        return (modes,) * nd
    modes = tuple(int(m) for m in modes)
    assert len(modes) == nd, "modes must be int or a tuple of length num_spatial_dims"
    return modes


class SpectralConvND(nn.Module):
    """Mode-truncated spectral conv with optional FiLM conditioning."""

    in_channels: int
    out_channels: int
    modes: Tuple[int, ...]
    num_spatial_dims: int
    feature_transform: bool = False
    feature_transform_dim: int = 0
    transform_mode: int = 1
    mix_impl: str = "dft"

    @nn.compact
    def __call__(self, x, p=None):
        nd = self.num_spatial_dims
        modes = self.modes
        n_blocks = {1: 1, 2: 2, 3: 4}[nd]
        scale = 1.0 / (self.in_channels * self.out_channels)
        weights = [
            self.param(f"weights{i + 1}", init.spectral_weight_init(scale),
                       (2, self.in_channels, self.out_channels, *modes),
                       jnp.float32)
            for i in range(n_blocks)
        ]

        film = None
        if self.feature_transform:
            assert p is not None, "FiLM conditioning requires the cond vector"
            if nd == 1:
                grid = (self.out_channels, modes[0])
            elif nd == 2:
                grid = (self.out_channels, 2 * modes[0], modes[1])
            else:
                raise NotImplementedError("FiLM for 3D spectral convs")
            fw = Dense(int(np.prod(grid)), name="weights_feat")(p)
            film = fw.reshape((p.shape[0],) + grid)

        return spectral_conv_nd(x, weights, modes, film=film,
                                film_mode=self.transform_mode,
                                num_spatial_dims=nd, mix_impl=self.mix_impl)


class FNO_Layer(nn.Module):
    """Spectral conv + pointwise conv(s), summed, optional activation."""

    hidden_dim: int
    num_spatial_dims: int = 1
    kernel_size: int = 1
    modes: Union[int, Sequence[int]] = 16
    activation: Any = "gelu"
    feature_transform: bool = False
    feature_transform_dim: int = 6
    transform_mode: int = 0
    hidden_dim_out: int = None
    conv_mode: str = "single"
    padding_mode: str = "circular"
    mix_impl: str = "dft"

    @nn.compact
    def __call__(self, x, p=None):
        assert self.conv_mode in ("single", "double")
        nd = self.num_spatial_dims
        out_ch = self.hidden_dim_out or self.hidden_dim
        modes = _modes_tuple(self.modes, nd)
        sp = x.shape[1:1 + nd]
        for i, s in enumerate(sp):
            if i == len(sp) - 1:
                assert modes[i] <= s // 2 + 1, \
                    "modes must be <= n//2+1 on the last spatial dim"
            else:
                assert modes[i] <= s, "modes must be <= the spatial dim"

        x1 = SpectralConvND(
            in_channels=x.shape[-1], out_channels=out_ch, modes=modes,
            num_spatial_dims=nd, feature_transform=self.feature_transform,
            feature_transform_dim=self.feature_transform_dim,
            transform_mode=self.transform_mode, mix_impl=self.mix_impl,
            name="conv")(x, p)

        if self.conv_mode == "single":
            x2 = ConvND(out_ch, self.kernel_size, nd, padding="same",
                        padding_mode=self.padding_mode, name="w")(x)
            y = x1 + x2
        else:
            x2 = ConvND(out_ch, 1, nd, padding="same", name="w")(x)
            x3 = ConvND(out_ch, self.kernel_size, nd, padding="same",
                        padding_mode=self.padding_mode, name="w2")(x)
            y = x1 + x2 + x3

        if self.activation is not None:
            y = resolve_activation(self.activation)(y)
        return y


class FNO(nn.Module):
    """FNO processor (``proc_fno.py:22-83``). Channels-last h in/out."""

    model_interface = M.AR_TB
    data_interface = (D.sim1d, D.sim1d_var_t, D.sim2d)

    pde: Any = None
    num_spatial_dims: int = 1
    n_cond: int = 0
    hidden_features: int = 128
    fno_modes: Union[int, Sequence[int]] = 48
    hidden_blocks: int = 4
    cond_mode: str = "concat"
    fno_kernel_size: int = 1
    fno_conv_mode: str = "single"
    padding_mode: str = "circular"
    mix_impl: str = "dft"
    remat: bool = True  # rematerialize per layer in the backward pass

    @nn.compact
    def __call__(self, h, variables=None, variables_broadcast=None, pos=None):
        assert self.cond_mode in ("film", "concat", None), \
            "Incorrect conditioning mode supplied"
        film = self.cond_mode == "film" and self.n_cond > 0
        hidden_in = (self.hidden_features + self.n_cond
                     if self.cond_mode == "concat" else self.hidden_features)
        pm = self.padding_mode if self.padding_mode != "ones" else "zeros"
        LayerCls = nn.remat(FNO_Layer) if self.remat else FNO_Layer

        for i in range(self.hidden_blocks):
            layer = LayerCls(
                hidden_dim=hidden_in, hidden_dim_out=self.hidden_features,
                num_spatial_dims=self.num_spatial_dims, modes=self.fno_modes,
                feature_transform=film, feature_transform_dim=self.n_cond,
                kernel_size=self.fno_kernel_size, conv_mode=self.fno_conv_mode,
                padding_mode=pm, mix_impl=self.mix_impl,
                name=f"fno_layers_{i}")
            if self.cond_mode == "film":
                h = layer(h, p=variables)
            else:
                h_in = (jnp.concatenate([h, variables_broadcast], axis=-1)
                        if variables_broadcast is not None else h)
                h = layer(h_in)
        return h
