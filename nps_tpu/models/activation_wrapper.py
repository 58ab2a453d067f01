"""Physics post-processing wrapper: final activation, obstacle masking, and
approximate volume (mass) preservation.

Capability parity with ``src/models/activation_wrapper.py``: the reference
builds a dynamic subclass overriding ``forward``; here it is a flax module
wrapping the inner model's output with the same pure math:

- final activation (Tanh in all twophase configs);
- ``enforce_spatial_cond``: zero the output wherever the selected
  spatial-conditioning channel is 1 (obstacle mask), via ``u - mask*u``;
- ``approx_volume_preserve``: rescale outputs so each frame's spatial
  integral tracks the last input frame's, bounding per-step drift with a
  ``tanh(dif/max_pct_dif)`` soft clip; three modes: 'block', 'individual'
  (sequential -> ``lax.scan``), 'individual_static' (vectorized with a
  cumulative tolerance; used by all twophase configs);
- the obstacle mask is re-applied after rescaling.

All math runs in the reference layout [b, c, tw, *sp]; it is elementwise /
reduction work that XLA fuses into the decoder's epilogue.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from nps_tpu.models.activations import resolve_activation


def _spatial_axes(u):
    return tuple(range(3, u.ndim))


def _apply_spatial_cond(spatial_cond, u, channel):
    to_zero = spatial_cond[:, channel]                 # [b, *sp]
    to_zero = to_zero[:, None, None, ...]              # [b, 1, 1, *sp]
    return u - to_zero * u


def volume_preserve(u, u_prev, mode, max_pct_dif):
    """Rescale frames of ``u`` toward the spatial integral of the last input
    frame of ``u_prev``. u, u_prev: [b, c, tw, *sp]."""
    sp_axes = _spatial_axes(u)
    nd = len(sp_axes)
    if nd != 2:
        raise ValueError(
            f"{nd} spatial dims not supported for approx volume preserve")
    tw = u.shape[2]
    bshape = u.shape[:2] + (1,) * (u.ndim - 2)  # [b, c, 1, 1, 1]

    new_totals = jnp.sum(u, axis=sp_axes)                   # [b, c, tw]
    prev_totals = jnp.sum(u_prev[:, :, -1, ...],
                          axis=tuple(a - 1 for a in sp_axes))  # [b, c]

    if mode == "block":
        new_mean = jnp.mean(new_totals, axis=2)             # [b, c]
        dif = (1.0 - new_mean / prev_totals) * 100.0
        dif = jnp.tanh(dif / max_pct_dif) / 100.0 * max_pct_dif
        resc = 1.0 - dif
        return (u / new_mean.reshape(bshape)) * (
            (prev_totals * resc).reshape(bshape))

    if mode == "individual":
        def step(prev, new_i):
            dif = (1.0 - new_i / prev) * 100.0
            dif = jnp.tanh(dif / max_pct_dif) / 100.0 * max_pct_dif
            r = 1.0 - dif
            return r * prev, (r, prev)

        # scan over the tw axis of new_totals [b, c, tw] -> [tw, b, c]
        _, (resc_all, prev_all) = jax.lax.scan(
            step, prev_totals, jnp.moveaxis(new_totals, 2, 0))
        resc_all = jnp.moveaxis(resc_all, 0, 2)             # [b, c, tw]
        prev_all = jnp.moveaxis(prev_all, 0, 2)
        scale = (resc_all * prev_all) / new_totals
        return u * scale[..., *([None] * len(sp_axes))]

    if mode == "individual_static":
        prev_all = jnp.repeat(prev_totals[:, :, None], tw, axis=2)  # [b, c, tw]
        max_all = max_pct_dif * jnp.arange(1, tw + 1, dtype=u.dtype)
        dif = (1.0 - new_totals / prev_all) * 100.0
        dif = jnp.tanh(dif / max_all) / 100.0 * max_all
        resc_all = 1.0 - dif
        scale = (resc_all * prev_all) / new_totals
        return u * scale[..., *([None] * len(sp_axes))]

    raise ValueError(f"Unrecognized approx_volume_preserve_mode '{mode}'")


class ActivationWrapper(nn.Module):
    """Wraps an inner model with the physics output constraints."""

    inner: Any
    activation_final: Any = None
    enforce_spatial_cond: bool = False
    spatial_cond_channel: int = 0
    approx_volume_preserve: bool = False
    approx_volume_preserve_mode: str = "block"
    max_pct_dif: float = 1.0

    @property
    def model_interface(self):
        return self.inner.model_interface

    @property
    def data_interface(self):
        return self.inner.data_interface

    @nn.compact
    def __call__(self, u, cond=None, bc=None, pos=None, t_cond=None,
                 spatial_cond=None, **kwargs):
        # **kwargs: pass-through for inner-model extras (e.g. the graph
        # path's grid_meta); the wrapper must be call-compatible with the
        # model it wraps
        if hasattr(u, "edge_index") and (self.enforce_spatial_cond
                                         or self.approx_volume_preserve):
            raise ValueError(
                "enforce_spatial_cond / approx_volume_preserve are "
                "grid-space constraints; the graph path produces "
                "node-space outputs — disable them or wrap a grid model")
        act = resolve_activation(self.activation_final)
        out = act(self.inner(u, cond=cond, bc=bc, pos=pos, t_cond=t_cond,
                             spatial_cond=spatial_cond, **kwargs))
        if self.enforce_spatial_cond:
            out = _apply_spatial_cond(spatial_cond, out,
                                      self.spatial_cond_channel)
        if self.approx_volume_preserve:
            out = volume_preserve(out, u, self.approx_volume_preserve_mode,
                                  self.max_pct_dif)
            if self.enforce_spatial_cond:
                out = _apply_spatial_cond(spatial_cond, out,
                                          self.spatial_cond_channel)
        return out


def activation_wrapper(model_class, activation_final,
                       enforce_spatial_cond=False, spatial_cond_channel=0,
                       approx_volume_preserve=False,
                       approx_volume_preserve_mode="block", max_pct_dif=1,
                       *args, **kwargs):
    """Factory matching the reference entry point
    (``activation_wrapper(model_class='EncProcDec', ...)``)."""
    from nps_tpu.models.enc_proc_dec import _component_registry
    from nps_tpu.utils.attr import getattr_nested

    model_init = None
    for module in _component_registry():
        found = getattr_nested(module, model_class)
        if found is not False:
            model_init = found
            break
    if model_init is None:
        raise ValueError(f"Model {model_class} not found")

    inner = model_init(*args, **kwargs)
    return ActivationWrapper(
        inner=inner, activation_final=activation_final,
        enforce_spatial_cond=enforce_spatial_cond,
        spatial_cond_channel=spatial_cond_channel,
        approx_volume_preserve=approx_volume_preserve,
        approx_volume_preserve_mode=approx_volume_preserve_mode,
        max_pct_dif=max_pct_dif)
