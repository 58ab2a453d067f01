"""Spatial-sharding building blocks on the 8-device CPU mesh: the sharded
circular conv and the sharded truncated row-DFT must match their
single-device references."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nps_tpu.parallel import make_mesh
from nps_tpu.parallel.spatial import (sharded_conv2d_same_circular,
                                      sharded_spectral_rows_transform)
from nps_tpu.ops.spectral import _dft_mats_fwd_rows


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8], axis_name="x")


def test_sharded_circular_conv_matches_local(mesh, rng):
    b, X, Y, ci, co = 2, 32, 16, 3, 4
    x = rng.standard_normal((b, X, Y, ci), dtype=np.float32)
    k = rng.standard_normal((3, 3, ci, co), dtype=np.float32) * 0.3

    # single-device reference: wrap-pad + VALID conv
    xp = np.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="wrap")
    dn = jax.lax.conv_dimension_numbers(xp.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(jnp.array(xp), jnp.array(k), (1, 1),
                                       "VALID", dimension_numbers=dn)

    fn = sharded_conv2d_same_circular(mesh, "x")
    out = jax.jit(fn)(jnp.array(x), jnp.array(k))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_row_dft_matches_local(mesh, rng):
    b, X, m2, c, m1 = 2, 32, 5, 3, 4
    x = rng.standard_normal((b, X, m2, c), dtype=np.float32)
    c1_np, s1_np = _dft_mats_fwd_rows(X, m1)
    c1, s1 = jnp.array(c1_np), jnp.array(s1_np)

    ref_re = jnp.einsum("bxmc,xk->bkmc", x, c1)
    ref_im = -jnp.einsum("bxmc,xk->bkmc", x, s1)

    fn = sharded_spectral_rows_transform(mesh, "x")
    re, im = jax.jit(fn)(jnp.array(x), c1, s1)
    np.testing.assert_allclose(np.asarray(re), np.asarray(ref_re),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(im), np.asarray(ref_im),
                               rtol=1e-4, atol=1e-5)
