"""U-FNO processor: per block, a spectral FNO layer and a full mini-U-Net
run in parallel on the same input, summed, then activated.

Capability parity with ``src/models/enc_proc_dec_components/proc_ufno.py``:
the FNO_Layer is built with ``activation=None`` (``proc_ufno.py:83``) so the
activation is applied once, after the branch sum (``:118``).
"""

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.common.interfaces import D, M
from nps_tpu.models.activations import resolve_activation
from nps_tpu.models.fno import FNO_Layer
from nps_tpu.models.unet_modern import UNetModern


class UFNO(nn.Module):
    model_interface = M.AR_TB
    data_interface = (D.sim1d, D.sim1d_var_t, D.sim2d)

    pde: Any = None
    num_spatial_dims: int = 1
    n_cond: int = 0
    hidden_features: int = 128
    hidden_blocks: int = 4
    cond_mode: str = "concat"
    padding_mode: str = "circular"

    # FNO specific
    fno_modes: Union[int, Sequence[int]] = 48
    fno_kernel_size: int = 1
    fno_conv_mode: str = "single"

    # UNet specific
    activation: Any = "gelu"
    norm: bool = False
    ch_mults: Sequence[int] = (1, 1, 1)
    is_attn: Sequence[bool] = (False, False, False)
    mid_attn: bool = False
    n_blocks: int = 1
    use1x1: bool = True
    mix_impl: str = "dft"
    # rematerialize each (spectral + U-Net) block in the backward pass:
    # trades recompute for O(1)-block activation memory. With the DFT
    # spectral path and bf16 activations the full 128^2 b16 workload fits
    # HBM *without* remat and runs ~25% faster (27.7 vs 22.2 samples/s on
    # v5e), so remat defaults off; enable it (optionally with
    # remat_policy="save_conv_outputs", the fastest rematting mode) for
    # large grids — cfg_ns512_ufno sets remat=True for 512^2.
    remat: bool = False
    remat_policy: Any = None

    @nn.compact
    def __call__(self, h, variables=None, variables_broadcast=None, pos=None):
        assert self.cond_mode in ("film", "concat", None), \
            "Incorrect conditioning mode supplied"
        if self.cond_mode == "film":
            # dead upstream path: the reference forwards cond_mode into its
            # UNet branch (proc_ufno.py:91), whose constructor asserts
            # concat/None (proc_unet_modern.py:65) — film-UFNO can never
            # run there either; reject with a message instead of tracing
            # into the same assert
            raise ValueError(
                "UFNO cond_mode='film' is a dead path upstream (the UNet "
                "branch only supports concat/None); use cond_mode='concat' "
                "or a pure FNO processor for FiLM")
        act = resolve_activation(self.activation)
        film = self.cond_mode == "film" and self.n_cond > 0
        hidden_in = (self.hidden_features + self.n_cond
                     if self.cond_mode == "concat" else self.hidden_features)
        pm = self.padding_mode if self.padding_mode != "ones" else "zeros"
        from nps_tpu.models.common import resolve_remat_policy

        policy = resolve_remat_policy(self.remat_policy)
        if self.remat:
            FNOLayerCls = nn.remat(FNO_Layer, policy=policy)
            UNetCls = nn.remat(UNetModern, policy=policy)
        else:
            FNOLayerCls, UNetCls = FNO_Layer, UNetModern

        for i in range(self.hidden_blocks):
            fno_layer = FNOLayerCls(
                hidden_dim=hidden_in, hidden_dim_out=self.hidden_features,
                num_spatial_dims=self.num_spatial_dims, modes=self.fno_modes,
                feature_transform=film, feature_transform_dim=self.n_cond,
                kernel_size=self.fno_kernel_size, conv_mode=self.fno_conv_mode,
                padding_mode=pm, activation=None, mix_impl=self.mix_impl,
                name=f"fno_layers_{i}")
            unet = UNetCls(
                pde=self.pde, num_spatial_dims=self.num_spatial_dims,
                n_cond=self.n_cond, hidden_features=self.hidden_features,
                cond_mode=self.cond_mode, activation=self.activation,
                norm=self.norm, ch_mults=tuple(self.ch_mults),
                is_attn=tuple(self.is_attn), mid_attn=self.mid_attn,
                n_blocks=self.n_blocks, use1x1=self.use1x1,
                padding_mode=self.padding_mode, name=f"unet_layers_{i}")

            if self.cond_mode == "film":
                h_fno = fno_layer(h, p=variables)
            else:
                h_in = (jnp.concatenate([h, variables_broadcast], axis=-1)
                        if variables_broadcast is not None else h)
                h_fno = fno_layer(h_in)
            h_unet = unet(h, variables_broadcast=variables_broadcast, pos=pos)
            h = act(h_fno + h_unet)
        return h
