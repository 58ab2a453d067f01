"""Grid decoders: channels-last hidden grid -> [b, c, tw, *sp] prediction.

Capability parity with ``src/models/enc_proc_dec_components/dec_grid.py``:
- ``add_delta`` (``dec_grid.py:8-31``): all decoders emit a *delta* which is
  added to the last input frame; 'per_step' scales by cumsum(dt) per bundled
  step (Brandstetter et al. eq. 10), 'all' by dt, 'none' raw;
- ``LinearConv``, ``TimeConv``, ``TimeConvDense`` (used by all twophase
  configs), ``TimeConvLinear`` with the reference's derived kernel/stride
  formulas.

TPU notes: the per-pixel time CNNs operate on a [b*prod(sp), t, c] layout —
a huge batch of tiny 1D convs that XLA maps onto well-utilized fused
convolutions; reshapes are layout changes only.
"""

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.models.activations import Swish, resolve_activation
from nps_tpu.models.common import ConvND


def add_delta(delta, u, pde_dt, time_window, num_spatial_dims,
              delta_mode="per_step", delta_dt=True):
    """delta, u: [b, c, tw, *sp] (reference layout)."""
    if delta_dt is False:
        pde_dt = 1.0
    assert delta_mode in ("per_step", "all", "none")
    if delta_mode == "none":
        return delta
    u_last = u[:, :, -1:, ...]  # broadcasts over tw
    if delta_mode == "all":
        return u_last + pde_dt * delta
    # per_step: cumulative dt per bundled step
    dt = pde_dt * jnp.arange(1, time_window + 1, dtype=delta.dtype)
    dt = dt.reshape((1, 1, time_window) + (1,) * num_spatial_dims)
    return u_last + dt * delta


def _to_pixel_time(h, num_spatial_dims):
    """[b, *sp, C] -> ([b*prod(sp), C], batch, spatial_shape)."""
    nd = num_spatial_dims
    b = h.shape[0]
    sp = h.shape[1:1 + nd]
    return h.reshape((-1, h.shape[-1])), b, sp


def _from_pixel_time(delta, b, sp, num_c, time_window, num_spatial_dims):
    """[b*prod(sp), num_c, tw] -> [b, c, tw, *sp] (reference layout)."""
    nd = num_spatial_dims
    delta = delta.reshape((b,) + tuple(sp) + (num_c, time_window))
    # [b, *sp, c, tw] -> [b, c, tw, *sp]
    perm = (0, 1 + nd, 2 + nd) + tuple(range(1, 1 + nd))
    return jnp.transpose(delta, perm)


class LinearConv(nn.Module):
    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    dec_kernel_size: int = 3
    dec_padding_mode: str = "zeros"
    dec_delta_mode: str = "per_step"
    dec_delta_dt: bool = True

    @nn.compact
    def __call__(self, h, u, **kwargs):
        nd = self.num_spatial_dims
        delta = ConvND(self.num_c * self.time_window, self.dec_kernel_size,
                       nd, padding="same", padding_mode=self.dec_padding_mode,
                       name="decoder")(h)
        # channels ordered (c, tw) c-major, matching torch's view(u.shape)
        b = delta.shape[0]
        sp = delta.shape[1:1 + nd]
        delta = delta.reshape((b,) + tuple(sp) + (self.num_c, self.time_window))
        perm = (0, 1 + nd, 2 + nd) + tuple(range(1, 1 + nd))
        delta = jnp.transpose(delta, perm)
        return add_delta(delta, u, self.pde.dt, self.time_window, nd,
                         self.dec_delta_mode, self.dec_delta_dt)


class TimeConv(nn.Module):
    """Per-pixel nonlinear 1D CNN over the hidden dim (``dec_grid.py:58-94``)."""

    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    dec_delta_mode: str = "per_step"
    dec_delta_dt: bool = True

    @nn.compact
    def __call__(self, h, u, **kwargs):
        nd = self.num_spatial_dims
        var = self.time_window + 9
        stride = self.hidden_features // var
        assert stride > 0, "found stride 0 -- hidden_features is too small!"
        kernelsize = self.hidden_features - stride * var + 1

        hp, b, sp = _to_pixel_time(h, nd)        # [B', hid]
        x = hp[:, :, None]                        # [B', hid(=length), 1ch]
        x = ConvND(8, kernelsize, 1, strides=stride, padding="valid",
                   name="decoder_0")(x)
        x = Swish()(x)
        x = ConvND(self.num_c, 10, 1, padding="valid", name="decoder_2")(x)
        # x: [B', tw, num_c] -> [B', num_c, tw]
        delta = jnp.swapaxes(x, 1, 2)
        delta = _from_pixel_time(delta, b, sp, self.num_c, self.time_window, nd)
        return add_delta(delta, u, self.pde.dt, self.time_window, nd,
                         self.dec_delta_mode, self.dec_delta_dt)


class TimeConvDense(nn.Module):
    """1x1 conv to tw*3*num_c + per-pixel 2-layer time CNN (``dec_grid.py:97-146``)."""

    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    activation: Any = "gelu"
    dec_delta_mode: str = "per_step"
    dec_delta_dt: bool = True

    @nn.compact
    def __call__(self, h, u, **kwargs):
        act = resolve_activation(self.activation)
        nd = self.num_spatial_dims
        tw = self.time_window

        decoder_input_dim = tw * 3 * self.num_c
        h = ConvND(decoder_input_dim, 1, nd, padding="valid",
                   name="pre_decoder")(h)

        kernel_size_a = math.ceil(tw / 2)
        kernel_size_b = math.ceil(tw / 4) + 1
        if tw % 4 == 0:
            kernel_size_b += 1

        hp, b, sp = _to_pixel_time(h, nd)  # [B', tw*3*num_c]
        # channel vector is (num_c, tw*3) c-major -> [B', num_c, tw*3]
        x = hp.reshape((-1, self.num_c, tw * 3))
        x = jnp.swapaxes(x, 1, 2)          # [B', tw*3, num_c]
        x = ConvND(self.num_c * 2, kernel_size_a, 1, strides=2,
                   padding="valid", name="decoder_0")(x)
        x = act(x)
        x = ConvND(self.num_c, kernel_size_b, 1, padding="valid",
                   name="decoder_2")(x)
        delta = jnp.swapaxes(x, 1, 2)      # [B', num_c, tw]
        delta = _from_pixel_time(delta, b, sp, self.num_c, tw, nd)
        return add_delta(delta, u, self.pde.dt, tw, nd,
                         self.dec_delta_mode, self.dec_delta_dt)


class TimeConvLinear(nn.Module):
    pde: Any = None
    num_c: int = 1
    num_spatial_dims: int = 1
    time_window: int = 25
    hidden_features: int = 128
    activation: Any = "gelu"
    dec_delta_mode: str = "per_step"
    dec_delta_dt: bool = True

    @nn.compact
    def __call__(self, h, u, **kwargs):
        nd = self.num_spatial_dims
        tw = self.time_window
        decoder_input_dim = tw * 3 - 1 - math.ceil((tw - 1) / 2)
        if tw == 1:
            decoder_input_dim -= 1
        h = ConvND(decoder_input_dim * self.num_c, 1, nd, padding="valid",
                   name="pre_decoder")(h)
        kernel_size_a = math.ceil(tw / 2)

        hp, b, sp = _to_pixel_time(h, nd)
        x = hp.reshape((-1, self.num_c, decoder_input_dim))
        x = jnp.swapaxes(x, 1, 2)
        x = ConvND(self.num_c, kernel_size_a, 1, strides=2, padding="valid",
                   name="decoder")(x)
        delta = jnp.swapaxes(x, 1, 2)
        delta = _from_pixel_time(delta, b, sp, self.num_c, tw, nd)
        return add_delta(delta, u, self.pde.dt, tw, nd,
                         self.dec_delta_mode, self.dec_delta_dt)
