"""Dilated ResNet processor (Stachenfeld et al. 2022, learned turbulence).

Capability parity with
``src/models/enc_proc_dec_components/proc_dilatedresnet.py``: each block is
7 same-padded convs with dilation rates (1,2,4,8,4,2,1) and an activation
after each; a residual connection wraps each block; the broadcast
conditioning grid is concatenated before every block.

TPU notes: dilated convs lower to ``lax.conv_general_dilated`` with
``rhs_dilation``; circular same-padding is a wrap-pad + VALID conv, which
XLA fuses into the convolution's halo handling.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.common.interfaces import D, M
from nps_tpu.models.activations import resolve_activation
from nps_tpu.models.common import ConvND


class DilatedResnetBlock(nn.Module):
    num_spatial_dims: int = 1
    hidden_features_in: int = 48
    kernel_size: int = 3
    dilation_rates: Sequence[int] = (1, 2, 4, 8, 4, 2, 1)
    activation: Any = "relu"
    padding_mode: str = "zeros"
    hidden_features_out: int = None

    @nn.compact
    def __call__(self, x):
        act = resolve_activation(self.activation)
        out = self.hidden_features_out or self.hidden_features_in
        for l, dil in enumerate(self.dilation_rates):
            x = ConvND(out, self.kernel_size, self.num_spatial_dims,
                       padding="same", padding_mode=self.padding_mode,
                       dilation=dil, name=f"conv_{l}")(x)
            x = act(x)
        return x


class DilatedResnet(nn.Module):
    model_interface = M.AR_TB
    data_interface = (D.sim1d, D.sim2d, D.sim1d_var_t)

    pde: Any = None
    hidden_features: int = 128
    kernel_size: int = 3
    hidden_blocks: int = 4
    activation: Any = "relu"
    padding_mode: str = "zeros"
    num_spatial_dims: int = 1
    n_cond: int = 0
    remat: bool = True  # rematerialize per block in the backward pass

    @nn.compact
    def __call__(self, h, variables_broadcast=None, pos=None):
        BlockCls = (nn.remat(DilatedResnetBlock) if self.remat
                    else DilatedResnetBlock)
        for b in range(self.hidden_blocks):
            if variables_broadcast is not None:
                enc_input = jnp.concatenate([h, variables_broadcast], axis=-1)
            else:
                enc_input = h
            block = BlockCls(
                num_spatial_dims=self.num_spatial_dims,
                hidden_features_in=self.hidden_features + self.n_cond,
                kernel_size=self.kernel_size,
                activation=self.activation, padding_mode=self.padding_mode,
                hidden_features_out=self.hidden_features,
                name=f"block_{b}")
            h = h + block(enc_input)
        return h
