"""Grid encoders: [b, c, tw, *sp] input window -> channels-last hidden grid.

Capability parity with ``src/models/enc_proc_dec_components/enc_grid.py``:
- ``LinearConv``: flatten the (c, tw) bundle into channels + one same-padded
  conv (``enc_grid.py:7-21``);
- ``ElementWise`` (used by all twophase configs): concat flattened input +
  position grid + broadcast conditioning, then two 1x1 convs with an
  activation after each (``enc_grid.py:24-50``; adapted upstream from
  MP-PDE, arXiv:2202.03376).

TPU notes: the bundle flatten is a transpose+reshape into channels-last;
1x1 convs are per-pixel matmuls that land directly on the MXU.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.models.activations import Swish, resolve_activation
from nps_tpu.models.common import ConvND


def flatten_window_channels_last(u, num_spatial_dims):
    """[b, c, tw, *sp] -> [b, *sp, c*tw] with torch-flatten channel order."""
    nd = num_spatial_dims
    b, c, tw = u.shape[:3]
    # [b, c, tw, *sp] -> [b, *sp, c, tw]
    perm = (0,) + tuple(range(3, 3 + nd)) + (1, 2)
    u = jnp.transpose(u, perm)
    return u.reshape(u.shape[:1 + nd] + (c * tw,))


class LinearConv(nn.Module):
    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    enc_kernel_size: int = 3
    enc_padding_mode: str = "zeros"

    @nn.compact
    def __call__(self, u, variables_broadcast=None, pos=None):
        h = flatten_window_channels_last(u, self.num_spatial_dims)
        return ConvND(self.hidden_features, self.enc_kernel_size,
                      self.num_spatial_dims, padding="same",
                      padding_mode=self.enc_padding_mode, name="encoder")(h)


class ElementWise(nn.Module):
    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    n_cond: int = 0
    activation: Any = Swish()

    @nn.compact
    def __call__(self, u, pos=None, variables_broadcast=None):
        act = resolve_activation(self.activation)
        nd = self.num_spatial_dims
        h = flatten_window_channels_last(u, nd)
        if pos.ndim == 1 + nd:  # [b, *sp] -> [b, *sp, 1]
            pos = pos[..., None]
        parts = [h, pos]
        if variables_broadcast is not None:
            parts.append(variables_broadcast)
        h = jnp.concatenate(parts, axis=-1)
        h = ConvND(self.hidden_features, 1, nd, padding="valid",
                   name="encoder_0")(h)
        h = act(h)
        h = ConvND(self.hidden_features, 1, nd, padding="valid",
                   name="encoder_2")(h)
        return act(h)
