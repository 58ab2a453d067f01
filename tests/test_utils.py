"""Utility-layer tests: collate/masks, slicing, stats, process_output."""

import os

import numpy as np
import jax.numpy as jnp

from nps_tpu.utils.collate import collate_batch_sim, collate_data, create_data_mask
from nps_tpu.utils.slice_batch import index_batch
from nps_tpu.utils.running_stats import RunningStats
from nps_tpu.utils.process_output import (process_step, set_bc_1d,
                                          set_min_values, extract_bc_1d)
from nps_tpu.common.interfaces import M
from nps_tpu.common.data_creator import create_data
from nps_tpu.pde import PDE1D


def test_collate_max_pads_to_tw_multiple(rng):
    els = [rng.random((2, t, 8)).astype(np.float32) for t in (13, 27, 20)]
    out = collate_batch_sim(t_dim=1, mode="max", tw=5)(els)
    assert out.shape == (3, 2, 30, 8)  # 27 -> 30
    np.testing.assert_array_equal(out[0, :, :13], els[0])
    assert np.abs(out[0, :, 13:]).max() == 0


def test_collate_min_crops_to_tw_multiple(rng):
    els = [rng.random((2, t, 8)).astype(np.float32) for t in (13, 27, 20)]
    out = collate_batch_sim(t_dim=1, mode="min", tw=5)(els)
    assert out.shape == (3, 2, 10, 8)  # min 13 -> 10


def test_create_data_mask():
    data = np.ones((3, 2, 10, 4))
    mask = create_data_mask(data, [4, 10, 7])
    assert mask[0, :, :4].min() == 1 and mask[0, :, 4:].max() == 0
    assert mask[1].min() == 1
    assert mask[2, :, 7:].max() == 0


def test_collate_data_tuple(rng):
    batch = []
    for t in (12, 17):
        batch.append((np.zeros(0, np.float32),
                      rng.random((2, t, 8)).astype(np.float32),
                      np.zeros((8,), np.float32),
                      rng.random(3).astype(np.float32),
                      np.zeros(0, np.float32)))
    u_base, u, x, var, cond, lengths = collate_data(mode="max", tw=4)(batch)
    assert u.shape == (2, 2, 20, 8)
    assert lengths == [12, 17]


def test_index_batch(rng):
    batch = (rng.random((4, 3)), [0, 1, 2, 3], {"a": rng.random((4, 2))}, None)
    out = index_batch(batch, np.array([1, 3]))
    assert out[0].shape == (2, 3)
    assert out[2]["a"].shape == (2, 2)


def test_running_stats(rng):
    vals = rng.random(1000)
    rs = RunningStats()
    for chunk in np.split(vals, 10):
        rs.push(chunk)
    assert np.isclose(rs.mean, vals.mean())
    assert np.isclose(rs.std, vals.std(), rtol=1e-3)
    assert rs.min == vals.min() and rs.max == vals.max()


def test_create_data_windows(rng):
    u = rng.random((2, 1, 20, 4)).astype(np.float32)
    data, labels = create_data(u, [5, 8], tw=5)
    np.testing.assert_array_equal(data[0], u[0][:, 0:5])
    np.testing.assert_array_equal(labels[1], u[1][:, 8:13])


def test_process_step_div1d_roundtrip(rng):
    """DIV1D is the only PDE with active BC/min logic; check it end to end."""
    pde = PDE1D(tmin=0, tmax=1, nt=11, L=1.0, nx=8, x=None, name="DIV1D",
                n_cond_static=0,
                var_mean_sd=[(0.0, 1.0), (0.0, 1.0), (0.0, 1.0), (0.0, 1.0)],
                bc_mode="delta")
    sim = jnp.array(rng.standard_normal((2, 4, 5, 8)), dtype=jnp.float32)
    gt_prev = jnp.array(rng.standard_normal((2, 4, 5, 8)), dtype=jnp.float32)
    gt_next = jnp.array(rng.standard_normal((2, 4, 5, 8)), dtype=jnp.float32)
    out, bc = process_step(pde, M.AR_TB, sim, gt_prev, gt_next,
                           get_bc=True, set_bc=True, set_min=True)
    # BCs injected at x=0 of channel 0, then min-clipped (reference order:
    # set_bc before set_min, so the boundary is clipped too)
    np.testing.assert_allclose(
        np.asarray(out[:, 0, :, 0]),
        np.maximum(np.asarray(gt_prev[:, 0, :, 0]), 0.1))
    # min clipping applied on channels 0, 2, 3
    for d in (0, 2, 3):
        assert float(out[:, d].min()) >= 0.1 - 1e-6
    assert bc.shape == (2, 2, 5)
    # process_settings can force them off
    out2, _ = process_step(pde, M.AR_TB, sim, gt_prev, gt_next, get_bc=False,
                           set_bc=True, set_min=True,
                           process_settings=dict(set_bc=False, set_min=False))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(sim))


def test_process_step_other_pde_noop(rng):
    pde = PDE1D(tmin=0, tmax=1, nt=11, L=1.0, nx=8, x=None, name="twophase")
    sim = jnp.ones((2, 1, 5, 8))
    out, bc = process_step(pde, M.AR_TB, sim, None, None)
    assert bc is None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sim))


def test_compile_cache_setup(tmp_path, monkeypatch):
    from nps_tpu.utils.compile_cache import enable_compile_cache
    import jax as _jax

    prev = _jax.config.jax_compilation_cache_dir
    try:
        d = enable_compile_cache(str(tmp_path / "xla"))
        assert d == str(tmp_path / "xla")
        assert _jax.config.jax_compilation_cache_dir == d
        assert os.path.isdir(d)
        # empty string and env kill-switch both disable
        assert enable_compile_cache("") is None
        monkeypatch.setenv("NPS_COMPILE_CACHE", "0")
        assert enable_compile_cache(str(tmp_path / "other")) is None
        assert not (tmp_path / "other").exists()
    finally:
        _jax.config.update("jax_compilation_cache_dir", prev)


def test_min_crop_alignment_across_roles():
    """mode='min' crops every data role with the SAME per-element window
    (regression: independent np.random draws per role paired the state
    window with wrong-time base/BC windows — an upstream reference bug,
    collate_batch_helpers.py:42)."""
    from nps_tpu.utils.collate import collate_data

    rng = np.random.default_rng(0)
    batch = []
    for t_len in (40, 35, 50):
        t = np.arange(t_len, dtype=np.float32)
        u_base = np.broadcast_to(t, (2, t_len)).copy()
        u_super = np.broadcast_to(t, (3, t_len)).copy()
        t_cond = np.broadcast_to(t, (1, t_len)).copy()
        batch.append((u_base, u_super, np.zeros(4, np.float32),
                      np.zeros(2, np.float32), t_cond))
    u_base, u_super, xs, variables, conditioning, lengths = \
        collate_data(t_dim=1, mode="min", tw=5)(batch)
    assert u_super.shape[2] == 35 - 35 % 5
    for i in range(3):
        np.testing.assert_array_equal(u_base[i, 0], u_super[i, 0])
        np.testing.assert_array_equal(conditioning[i, 0], u_super[i, 0])
    assert list(lengths) == [40, 35, 50]  # pre-crop, reference semantics


class TestCompileRetry:
    """utils/retry.py: bounded retry, gated strictly on the remote-compile
    tunnel signature (the round-4 GNN-run killer)."""

    MSG = ("INTERNAL: http://127.0.0.1:8103/remote_compile: read body: "
           "response body closed before all bytes were read")

    def test_retries_transient_then_succeeds(self):
        from nps_tpu.utils.retry import with_compile_retry

        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise RuntimeError(self.MSG)
            return "ok"

        assert with_compile_retry(flaky, retries=2, delay_s=0) == "ok"
        assert len(calls) == 3

    def test_non_matching_error_propagates_immediately(self):
        from nps_tpu.utils.retry import with_compile_retry

        calls = []

        def bad():
            calls.append(1)
            raise ValueError("nan loss")

        import pytest
        with pytest.raises(ValueError):
            with_compile_retry(bad, retries=5, delay_s=0)
        assert len(calls) == 1

    def test_exhausted_retries_raise(self):
        from nps_tpu.utils.retry import with_compile_retry

        calls = []

        def always():
            calls.append(1)
            raise RuntimeError(self.MSG)

        import pytest
        with pytest.raises(RuntimeError):
            with_compile_retry(always, retries=2, delay_s=0)
        assert len(calls) == 3
