"""Broadcast a [b, c] conditioning vector over a spatial grid.

Parity: ``src/utils/broadcast_to_grid.py`` (channel-first) — plus the
channels-last variant the TPU compute path uses internally.
"""

import jax.numpy as jnp


def broadcast_to_grid(x, spatial_dims):
    """[b, c] -> [b, c, *spatial_dims] (reference layout)."""
    shape = x.shape + (1,) * len(spatial_dims)
    return jnp.broadcast_to(x.reshape(shape), x.shape + tuple(spatial_dims))


def broadcast_to_grid_last(x, spatial_dims):
    """[b, c] -> [b, *spatial_dims, c] (TPU-internal channels-last layout)."""
    b, c = x.shape
    shape = (b,) + (1,) * len(spatial_dims) + (c,)
    return jnp.broadcast_to(x.reshape(shape), (b,) + tuple(spatial_dims) + (c,))
