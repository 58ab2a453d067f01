"""Data-transform tests (downsampling/interp matrix builders)."""

import numpy as np
import pytest

from nps_tpu.data import transforms as T


def test_downsample_matrix_interpolates_linearly():
    C = T.get_1d_downsample_matrix(9, 5)
    x = np.linspace(0, 1, 9, dtype=np.float32)
    out = x @ C
    np.testing.assert_allclose(out, np.linspace(0, 1, 5), rtol=1e-6, atol=1e-6)
    # columns are convex weights
    np.testing.assert_allclose(C.sum(axis=0), np.ones(5), rtol=1e-6)


def test_averaging_matrix_periodic():
    C = T.get_1d_averaging_matrix(8, 3, boundary="periodic")
    x = np.arange(8, dtype=np.float32)
    out = x @ C
    # interior: 3-point mean; boundary wraps
    assert np.isclose(out[3], (2 + 3 + 4) / 3)
    assert np.isclose(out[0], (7 + 0 + 1) / 3)
    np.testing.assert_allclose(C.sum(axis=0), np.ones(8), rtol=1e-6)


def test_averaging_matrix_fixed_boundary():
    C = T.get_1d_averaging_matrix(8, 3, boundary="fixed")
    x = np.arange(8, dtype=np.float32)
    out = x @ C
    assert np.isclose(out[0], (0 + 1) / 2)  # truncated window
    assert np.isclose(out[7], (6 + 7) / 2)


def test_downsample_1d_mm_roundtrip(rng):
    f = T.downsample_1d_mm(16, 8)
    x = rng.random((3, 16)).astype(np.float32)
    out = f(x)
    assert out.shape == (3, 8)
    # endpoints preserved exactly
    np.testing.assert_allclose(out[:, 0], x[:, 0])
    np.testing.assert_allclose(out[:, -1], x[:, -1])
    # no-op when nx_out >= nx_in
    g = T.downsample_1d_mm(8, 8)
    np.testing.assert_array_equal(g(x[:, :8]), x[:, :8])


def test_downsample_average_periodic_mm(rng):
    u = rng.random((12, 16)).astype(np.float32)  # [t, x]
    f = T.downsample_1d_average_periodic_mm(ratio_nt=2, nx_in=16, nx_out=8,
                                            n_average=3)
    out = f(u)
    assert out.shape == (6, 8)
    fc = T.downsample_1d_average_periodic_mm(ratio_nt=2, nx_in=16, nx_out=8,
                                             n_average=3, has_c=True)
    uc = rng.random((2, 12, 16)).astype(np.float32)
    assert fc(uc).shape == (2, 6, 8)


def test_get_t_downsample():
    tmin, tmax = T.get_t_downsample(0.0, 10.0, 11, ratio_nt=2)
    assert tmin == 0.0 and tmax == 10.0  # 0,2,4,6,8,10
    tmin, tmax = T.get_t_downsample(0.0, 10.0, 10, nt_out=5)
    assert np.isclose(tmax, 10.0 * 8 / 9)
    with pytest.raises(ValueError):
        T.get_t_downsample(0.0, 1.0, 10)


def test_interp_matrix_nonuniform():
    grid_in = np.array([0.0, 0.1, 0.5, 1.0])
    grid_out = np.array([0.05, 0.3, 0.75])
    C = T.get_1d_interp_matrix(grid_in, grid_out)
    vals = grid_in.astype(np.float32)  # linear fn -> exact interp
    np.testing.assert_allclose(vals @ C, grid_out, rtol=1e-6, atol=1e-6)
    # out-of-domain clamps to the ends
    C2 = T.get_1d_interp_matrix(grid_in, np.array([-1.0, 2.0]))
    np.testing.assert_allclose(vals @ C2, [0.0, 1.0])


def test_interp_to_even():
    grid_in = np.array([0.0, 0.2, 0.9, 1.0])
    C = T.get_1d_interp_matrix_to_even(grid_in)
    assert C.shape == (4, 4)
    np.testing.assert_allclose(grid_in @ C, np.linspace(0, 1, 4),
                               rtol=1e-6, atol=1e-6)


def test_downsample_2d_average_periodic(rng):
    u = rng.random((6, 16, 16)).astype(np.float32)
    out = T.downsample_2d_average_periodic(u, ratio_nt=2, ratio_nx=2)
    assert out.shape == (3, 8, 8)
    # constant field invariant under box smoothing
    c = np.full((4, 16, 16), 3.0, np.float32)
    np.testing.assert_allclose(
        T.downsample_2d_average_periodic(c, 1, 2), 3.0, rtol=1e-6)
