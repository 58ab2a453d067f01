"""Depth-generic (dynamic trip-count) pushforward train step.

The static builder compiles one XLA program per unroll depth (a fresh
``lax.scan`` length each); the dynamic builder traces the depth as an
operand of a ``lax.fori_loop`` so ONE compile serves every depth of the
ramp (``autoregressivepushforwardtrainer.py:78-82``). These tests pin:

- loss/params parity with the static builder at every depth (same initial
  state, same PRNG key — the randint start bound is the same arithmetic
  whether the bound is a constant or traced);
- one jit-cache entry serving the whole ramp through the public
  ``train_step`` dispatch;
- the host-side range validation the static builder did at trace time;
- the GNN (static-graph) model path through the dynamic step;
- the full trainer loop (train -> validate -> test) under the default
  ``dynamic_unroll=True``.
"""

import numpy as np
import jax
import pytest

import nps_tpu.models as models
from nps_tpu.models.activations import GELU


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset

    d = tmp_path_factory.mktemp("dynds") / "twophase"
    generate(str(d), n_sims=10, n_channels=2, nt=26, nx1=16, nx2=16, seed=5)
    return PDE2DDataset(
        base_path=str(d.parent), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")


def _trainer(dataset, tmp_path, tag, **extra):
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

    tw = 5
    # UFNO so the loop body exercises GroupNorm + GELU + spectral mixing
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="UFNO", fno_modes=4, hidden_blocks=1, hidden_features=16,
        fno_kernel_size=1, fno_conv_mode="single", padding_mode="circular",
        ch_mults=[1, 1], is_attn=[False, False], norm=True, use1x1=True,
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    return AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
        save_path=str(tmp_path / tag), time_window=tw,
        base_resolution=(26, 16, 16), super_resolution=(26, 16, 16),
        device="cpu", batch_size=4, nr_gt_steps=1, nw=0,
        num_epochs=extra.pop("num_epochs", 1), lr_step_interval=1,
        unrolling=extra.pop("unrolling", 2), print_interval=1,
        test_interval=2, process_settings={}, **extra)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.parametrize("depth", [0, 1, 2])
def test_dynamic_matches_static_per_depth(dataset, tmp_path, depth):
    tr = _trainer(dataset, tmp_path, f"d{depth}")
    loader = tr.get_dataloaders()[0]
    batch = next(iter(loader))
    tr.ensure_initialized(loader)
    params0 = jax.device_get(tr.params)
    u_base, u_super, x, cond, t_cond, sc = batch
    b, t_res = int(u_super.shape[0]), int(u_super.shape[2])
    key = jax.random.PRNGKey(7)

    def run(fn, extra_args=()):
        params = jax.tree_util.tree_map(np.array, params0)
        opt_state = tr.tx.init(params)
        return fn(params, opt_state, u_super, x, cond, t_cond, sc, key,
                  *extra_args)

    p_s, _, loss_s = run(tr._make_train_step(depth, b, t_res))
    p_d, _, loss_d = run(tr._make_train_step_dynamic(b, t_res),
                         (np.int32(depth),))
    np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-6)
    for a, b_ in zip(_leaves(p_s), _leaves(p_d)):
        np.testing.assert_allclose(a, b_, rtol=1e-6, atol=1e-7)


def test_one_cache_entry_serves_the_ramp(dataset, tmp_path):
    tr = _trainer(dataset, tmp_path, "ramp")
    loader = tr.get_dataloaders()[0]
    batch = next(iter(loader))
    tr.ensure_initialized(loader)
    # epochs 0, 1, 2 with lr_step_interval=1 ramp max_unrolling to 0, 1, 2
    losses = []
    for epoch in range(3):
        loss, _ = tr.train_step(batch, epoch=epoch, batch_idx=0,
                                loader=loader)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    train_keys = [k for k in tr._jit_cache if k[0].startswith("train")]
    assert train_keys == [("train_dyn", 4, 26)]
    # the compile-ahead worker must never start under the dynamic step
    assert tr._precompile_thread is None


def test_dynamic_range_validation(dataset, tmp_path):
    tr = _trainer(dataset, tmp_path, "range", unrolling=8)
    loader = tr.get_dataloaders()[0]
    batch = next(iter(loader))
    tr.ensure_initialized(loader)
    # t_res=26, tw=5: depth 4 needs tw*(4+2)=30 > 26 -> host-side raise
    import random as py_random

    py_random.seed(0)  # epoch 100 -> max_unrolling=8; force the draw high
    with pytest.raises(ValueError, match="trajectory too short"):
        for _ in range(64):  # some draws are shallow; a deep one must raise
            tr.train_step(batch, epoch=100, batch_idx=0, loader=loader)


def test_static_opt_out(dataset, tmp_path):
    tr = _trainer(dataset, tmp_path, "static", dynamic_unroll=False)
    loader = tr.get_dataloaders()[0]
    batch = next(iter(loader))
    tr.ensure_initialized(loader)
    loss, _ = tr.train_step(batch, epoch=0, batch_idx=0, loader=loader)
    assert np.isfinite(float(loss))
    assert ("train", 0, 4, 26) in tr._jit_cache
    assert not any(k[0] == "train_dyn" for k in tr._jit_cache)


def test_full_loop_under_dynamic_default(dataset, tmp_path):
    tr = _trainer(dataset, tmp_path, "loop", num_epochs=2, unrolling=1)
    out = tr.train()
    train_losses = out[0]
    assert len(train_losses) == 2
    assert all(np.isfinite(v) for v in train_losses)


def test_gnn_dynamic_matches_static(tmp_path):
    from nps_tpu.common.interfaces import D
    from nps_tpu.pde import PDE2D
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

    tw, nx = 4, 8
    t_res = 20
    pde = PDE2D(tmin=0.0, tmax=1.0, nt=t_res, L1=1.0, L2=1.0, nx1=nx, nx2=nx,
                x=None, name="twophase", n_cond_static=1, n_cond_dynamic=0,
                n_cond_spatial=0)
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw, data_structure="graph",
        encoder="gnn.NodeElementWise", processor="MPGNN",
        decoder="gnn.NodeTimeConvDense",
        hidden_features=16, hidden_blocks=2, pde=pde)

    class _Data:
        pass

    data = _Data()
    data.pde = pde
    data.data_interface = D.sim2d
    tr = AutoregressivePushforwardTrainer(
        model=model, data=data,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3),
        time_window=tw, base_resolution=[t_res, nx, nx], unrolling=2,
        lr_step_interval=1, nr_gt_steps=1, variable_time=False, neighbors=1,
        batch_size=2, save_path=str(tmp_path / "gnn"), device="cpu",
        process_settings={})

    rng = np.random.default_rng(3)
    b = 2
    u = rng.standard_normal((b, 1, t_res, nx, nx)).astype(np.float32)
    xs = np.linspace(0, 1, nx, dtype=np.float32)
    pos = np.stack(np.meshgrid(xs, xs, indexing="ij"),
                   axis=-1)[None].repeat(b, 0)  # [b, nx, nx, 2]
    cond = rng.standard_normal((b, 1)).astype(np.float32)
    t_cond = np.zeros((b, 0), np.float32)
    sc = np.zeros((b, 0), np.float32)
    u_base = np.zeros((0,), np.float32)
    tr.init_params((u_base, u[:, :, :2 * tw], pos, cond, t_cond, sc))
    params0 = jax.device_get(tr.params)
    tr._ensure_graph_static(pos, b)
    key = jax.random.PRNGKey(11)

    for depth in (0, 1):
        params = jax.tree_util.tree_map(np.array, params0)
        p_s, _, loss_s = tr._make_train_step(depth, b, t_res)(
            params, tr.tx.init(params), u, pos, cond, t_cond, sc, key)
        params = jax.tree_util.tree_map(np.array, params0)
        p_d, _, loss_d = tr._make_train_step_dynamic(b, t_res)(
            params, tr.tx.init(params), u, pos, cond, t_cond, sc, key,
            np.int32(depth))
        np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-6)
        for a, b_ in zip(_leaves(p_s), _leaves(p_d)):
            np.testing.assert_allclose(a, b_, rtol=1e-6, atol=1e-7)
