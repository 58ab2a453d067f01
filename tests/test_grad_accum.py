"""Gradient accumulation (`--trainer.grad_accum=N` -> optax.MultiSteps).

Beyond-reference trainer capability for capacity-capped configs (512²
runs at 2 samples/chip; accumulation recovers the reference's effective
batch 16 without the HBM). Pins:

- params change ONLY at every N-th mini-step (the boundary applies one
  averaged update);
- the host-side LR scheduler reaches the wrapped inner state;
- composes with data parallelism + ZeRO-1 (moments and accumulators
  sharded, finite losses).
"""

import numpy as np
import pytest
import jax

import nps_tpu.models as models
from nps_tpu.models.activations import GELU


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset

    d = tmp_path_factory.mktemp("gds") / "twophase"
    generate(str(d), n_sims=12, n_channels=2, nt=21, nx1=16, nx2=16,
             seed=10)
    return PDE2DDataset(
        base_path=str(d.parent), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")


def _trainer(dataset, tmp_path, tag, batch_size=4, **extra):
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

    tw = 5
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="DilatedResnet", kernel_size=3, hidden_blocks=1,
        hidden_features=8, padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    return AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3),
        lr_scheduler=dict(object="optim.lr_scheduler.MultiStepLR",
                          milestones=[1], gamma=0.5),
        save_path=str(tmp_path / tag), time_window=tw,
        base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
        device="cpu", batch_size=batch_size, nr_gt_steps=1, nw=0,
        num_epochs=1,
        lr_step_interval=1, unrolling=extra.pop("unrolling", 0),
        print_interval=1,
        test_interval=2, process_settings={}, **extra)


def test_updates_apply_at_accumulation_boundary(dataset, tmp_path):
    from nps_tpu.data.pipeline import device_put_batch

    tr = _trainer(dataset, tmp_path, "ga", grad_accum=2)
    loader = tr.get_dataloaders()[0]
    batch = device_put_batch(next(iter(loader)), None)
    tr.ensure_initialized(loader)
    p0 = jax.device_get(tr.params)

    tr.train_step(batch, epoch=0, batch_idx=0, loader=None)
    p1 = jax.device_get(tr.params)
    # mini-step 1 of 2: gradients accumulated, params UNCHANGED
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)

    tr.train_step(batch, epoch=0, batch_idx=1, loader=None)
    p2 = jax.device_get(tr.params)
    # boundary: one averaged update applies
    diffs = [float(np.max(np.abs(a - b)))
             for a, b in zip(jax.tree_util.tree_leaves(p1),
                             jax.tree_util.tree_leaves(p2))]
    assert max(diffs) > 0


def test_lr_scheduler_reaches_inner_state(dataset, tmp_path):
    from nps_tpu.train import optim as optim_lib

    tr = _trainer(dataset, tmp_path, "lr", grad_accum=2)
    loader = tr.get_dataloaders()[0]
    tr.ensure_initialized(loader)
    st = optim_lib.set_learning_rate(tr.opt_state, 123.0)
    inner = st.inner_opt_state
    assert float(inner.hyperparams["learning_rate"]) == 123.0


def test_grad_accum_composes_with_dp_zero1(dataset, tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tr = _trainer(dataset, tmp_path, "gz", grad_accum=2,
                  data_parallel=True, zero1=True, batch_size=8)
    losses, _, _ = tr.train()
    assert np.isfinite(losses[0])
    # the accumulator tree (param-shaped) is ZeRO-sharded too
    leaves = [x for x in jax.tree_util.tree_leaves(tr.opt_state)
              if hasattr(x, "sharding") and getattr(x, "ndim", 0) >= 1
              and x.shape[0] >= 8 and x.shape[0] % 8 == 0]
    assert leaves and all("data" in str(x.sharding.spec) for x in leaves)


def test_opt_state_fully_on_mesh_under_dp(dataset, tmp_path):
    """tx.init leaves the MultiSteps counters (mini_step/gradient_step) on
    the default device; under a mesh that mixed placement breaks AOT
    lowering of compile-ahead (dryrun regime 7 warned, round 4). Every
    opt_state leaf must live on the full mesh device set."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tr = _trainer(dataset, tmp_path, "gm", grad_accum=2,
                  data_parallel=True, batch_size=8, unrolling=1,
                  # compile-ahead exists only for the static per-depth path
                  dynamic_unroll=False)
    loader = tr.get_dataloaders()[0]
    tr.ensure_initialized(loader)
    mesh_devs = set(tr.mesh.devices.flat)
    for x in jax.tree_util.tree_leaves(tr.opt_state):
        if hasattr(x, "sharding"):
            assert set(x.sharding.device_set) == mesh_devs, x

    # the REAL compile-ahead worker must succeed against this state (it
    # AOT-lowers with the captured shardings; a single-device leaf in the
    # mix fails the lowering and silently forfeits the overlap)
    import warnings
    from nps_tpu.data.pipeline import device_put_batch

    _, u_super, x, cond, t_cond, sc = device_put_batch(
        next(iter(loader)), tr.sharding)
    key = jax.random.PRNGKey(0)  # uncommitted single-device, as in train_step
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        tr._maybe_precompile_ahead((u_super, x, cond, t_cond, sc, key))
        assert tr._precompile_thread is not None
        tr._precompile_thread.join(timeout=600)
    bad = [str(w.message) for w in rec if "compile-ahead" in str(w.message)]
    assert not bad, bad
    assert 1 in tr._precompiled_depths
