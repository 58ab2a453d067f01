"""Spatial-domain decomposition — the PDE analogue of sequence parallelism.

For grids too large for one chip (e.g. the 512^2 NS stretch config), the
spatial axes are sharded over mesh axes and stencil ops exchange halos with
``ppermute`` over ICI, inside ``shard_map``. Spectral convs under spatial
sharding use the truncated-DFT formulation (``nps_tpu.ops.spectral``):
the forward mode transform contracts the *local* rows, followed by a psum
over the sharded axis — no distributed FFT transposes needed.

This module provides the building blocks; wiring them through the full
model is a later-round milestone (SURVEY.md §7 step 8).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map


def halo_exchange(x, axis_name, halo, spatial_axis):
    """Append neighbor halos along a sharded spatial axis.

    x: the local shard [..., n_local, ...]; returns
    [..., halo + n_local + halo, ...] with wrap-around (periodic) halos
    fetched from ring neighbors via ppermute.
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    del idx

    def take(sl):
        slicer = [slice(None)] * x.ndim
        slicer[spatial_axis] = sl
        return x[tuple(slicer)]

    left_edge = take(slice(0, halo))            # to send to left neighbor
    right_edge = take(slice(x.shape[spatial_axis] - halo, None))

    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    # halo from the left neighbor = its right edge, moved right
    from_left = jax.lax.ppermute(right_edge, axis_name, right_perm)
    from_right = jax.lax.ppermute(left_edge, axis_name, left_perm)
    return jnp.concatenate([from_left, x, from_right], axis=spatial_axis)


def sharded_conv2d_same_circular(mesh, axis_name="x"):
    """Returns fn(x, kernel) computing a SAME, circularly-padded 2D conv
    with the first spatial axis sharded over `axis_name`.

    x: [b, X, Y, Ci] (X sharded); kernel: [kx, ky, Ci, Co] replicated.
    """

    def local_conv(x, kernel):
        kx, ky = kernel.shape[0], kernel.shape[1]
        hx, hy = (kx - 1) // 2, (ky - 1) // 2
        x = halo_exchange(x, axis_name, hx, spatial_axis=1)
        # the unsharded axis pads locally (periodic)
        x = jnp.pad(x, [(0, 0), (0, 0), (hy, hy), (0, 0)], mode="wrap")
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    return shard_map(
        local_conv, mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P()),
        out_specs=P(None, axis_name, None, None))


def sharded_spectral_rows_transform(mesh, axis_name="x"):
    """Returns fn(x, c1, s1) computing the truncated row-mode DFT of an
    X-sharded tensor: each device contracts its local rows with its slice
    of the DFT factors, then psums partial mode sums over the axis.

    x: [b, X, m2c...] (X sharded); c1/s1: [X, 2*m1] (row-sharded alike).
    """

    def local(x, c1, s1):
        re = jnp.einsum("bxmc,xk->bkmc", x, c1,
                        preferred_element_type=jnp.float32)
        im = -jnp.einsum("bxmc,xk->bkmc", x, s1,
                         preferred_element_type=jnp.float32)
        re = jax.lax.psum(re, axis_name)
        im = jax.lax.psum(im, axis_name)
        return re, im

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P(axis_name, None),
                  P(axis_name, None)),
        out_specs=(P(), P()))
