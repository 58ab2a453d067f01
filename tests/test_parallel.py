"""Data-parallel tests on the 8-device virtual CPU mesh.

Verifies the SPMD DP layer (mesh + NamedSharding + replicated params): the
sharded step must produce the same loss as single-device, and the driver
dryrun path must execute.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nps_tpu.parallel import make_mesh, batch_sharding, replicate


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


def test_sharded_matches_single_device(mesh):
    """A gradient step over a sharded batch == the same step unsharded."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 16)).astype(np.float32)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    y = rng.standard_normal((32, 16)).astype(np.float32)

    def loss_fn(w, x, y):
        return jnp.sum((x @ w - y) ** 2)

    grad_single = jax.jit(jax.grad(loss_fn))(w, x, y)

    data_sh = batch_sharding(mesh)
    repl_sh = NamedSharding(mesh, P())
    xs = jax.device_put(x, data_sh)
    ys = jax.device_put(y, data_sh)
    ws = jax.device_put(w, repl_sh)
    grad_sharded = jax.jit(jax.grad(loss_fn))(ws, xs, ys)

    np.testing.assert_allclose(np.asarray(grad_sharded),
                               np.asarray(grad_single), rtol=1e-5, atol=1e-5)


def test_dryrun_multichip(mesh):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_replicate_places_on_all_devices(mesh):
    tree = {"a": np.ones((4, 4), np.float32)}
    rep = replicate(tree, mesh)
    assert len(rep["a"].sharding.device_set) == 8


def test_trainer_data_parallel_end_to_end(mesh, tmp_path):
    """Full pushforward trainer with data_parallel=True on the CPU mesh."""
    import nps_tpu.models as models
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.models.activations import GELU, Tanh
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

    d = tmp_path / "twophase"
    generate(str(d), n_sims=16, n_channels=2, nt=21, nx1=16, nx2=16, seed=2)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[1], name="twophase")
    tw = 5
    model = models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / tw,
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="DilatedResnet", kernel_size=3, hidden_blocks=1,
        hidden_features=8, padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    tr = AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
        save_path=str(tmp_path / "model"), time_window=tw,
        base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
        device="cpu", batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1,
        lr_step_interval=1, unrolling=1, print_interval=1, test_interval=1,
        process_settings={}, data_parallel=True)
    train_losses, val_losses, _ = tr.train()
    assert np.isfinite(train_losses[0])
    # params actually replicated over the mesh
    leaf = jax.tree_util.tree_leaves(tr.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_dp_train_step_matches_single_device(mesh, tmp_path):
    """One pushforward train step over a sharded batch must produce the same
    loss and parameter update as the unsharded step (same key/batch)."""
    import nps_tpu.models as models
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.models.activations import GELU
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion
    from nps_tpu.data.pipeline import device_put_batch

    d = tmp_path / "twophase"
    generate(str(d), n_sims=12, n_channels=2, nt=21, nx1=16, nx2=16, seed=3)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")
    tw = 5

    def make_trainer(dp):
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
            optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
            save_path=str(tmp_path / f"m{dp}"), time_window=tw,
            base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
            device="cpu", batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1,
            lr_step_interval=1, unrolling=0, print_interval=1,
            test_interval=1, process_settings={}, data_parallel=dp)

    tr1 = make_trainer(False)
    tr2 = make_trainer(True)
    loader = tr1.get_dataloaders()[0]
    batch = next(iter(loader))
    tr1.ensure_initialized(loader)
    tr2.params = jax.device_get(tr1.params)
    from nps_tpu.parallel import replicate

    tr2.params = replicate(tr2.params, tr2.mesh)
    tr2._build_optimizer()

    b1 = device_put_batch(batch, None)
    b2 = device_put_batch(batch, tr2.sharding)
    loss1, _ = tr1.train_step(b1, epoch=0, batch_idx=0, loader=None)
    loss2, _ = tr2.train_step(b2, epoch=0, batch_idx=0, loader=None)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_trainer_device_cache_with_dp(mesh, tmp_path):
    """device_cache=True composes with data_parallel=True: the split is
    cached element-sharded over the mesh and an epoch trains to a finite
    loss through the on-device gather path."""
    import nps_tpu.models as models
    from nps_tpu.data.pipeline import DeviceCacheLoader
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.models.activations import GELU, Tanh
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

    d = tmp_path / "twophase"
    generate(str(d), n_sims=20, n_channels=2, nt=21, nx1=16, nx2=16, seed=4)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[1], name="twophase")
    assert len(dataset.train) == 16  # divisible by the 8-device mesh
    tw = 5
    model = models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / tw,
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="DilatedResnet", kernel_size=3, hidden_blocks=1,
        hidden_features=8, padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    tr = AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
        time_window=tw, base_resolution=(21, 16, 16), device="cpu",
        batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1, lr_step_interval=1,
        unrolling=1, print_interval=1, test_interval=1, process_settings={},
        data_parallel=True, device_cache=True)
    loaders = tr.get_dataloaders()
    assert isinstance(loaders[0], DeviceCacheLoader)
    # the cache is element-sharded across the mesh's data axis
    assert len(loaders[0]._cache[1].sharding.device_set) == 8
    tr.ensure_initialized(loaders[0])
    loss, n = tr.train_one_epoch(loaders[0], 1)
    assert np.isfinite(loss) and n == 16


def _resume_trainer(dataset, tmp_path, tag, num_epochs, resume=False,
                    parallel=None, blocks=1):
    import nps_tpu.models as models
    from nps_tpu.models.activations import GELU
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

    tw = 5
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="DilatedResnet", kernel_size=3, hidden_blocks=blocks,
        hidden_features=8, padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    return AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
        save_path=str(tmp_path / tag), time_window=tw,
        base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
        device="cpu", batch_size=8, nr_gt_steps=1, nw=0,
        num_epochs=num_epochs, lr_step_interval=1, unrolling=1,
        print_interval=1, test_interval=2, process_settings={},
        resume=resume, **(parallel or dict(data_parallel=True)))


@pytest.fixture(scope="module")
def resume_dataset(tmp_path_factory):
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset

    d = tmp_path_factory.mktemp("rds") / "twophase"
    generate(str(d), n_sims=20, n_channels=2, nt=21, nx1=16, nx2=16, seed=7)
    return PDE2DDataset(
        base_path=str(d.parent), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")


def test_resume_continues_training_under_dp(mesh, tmp_path, resume_dataset):
    """Kill-and-resume under data_parallel must reproduce the uninterrupted
    run exactly: restored params are re-replicated over the mesh, the
    loader shuffle RNG continues its sequence, and the post-resume epochs
    produce the same losses/params as if training had never stopped
    (VERDICT r2 weak #3)."""
    from nps_tpu.utils.seed import set_seed

    # run A: 4 epochs straight through (checkpoints at 2 and 4)
    set_seed(11)
    trA = _resume_trainer(resume_dataset, tmp_path, "A", num_epochs=4)
    lossesA, _, _ = trA.train()

    # run B: 2 epochs, "preemption", fresh process resumes to epoch 4
    set_seed(11)
    trB1 = _resume_trainer(resume_dataset, tmp_path, "B", num_epochs=2)
    lossesB1, _, _ = trB1.train()
    assert np.allclose(lossesB1, lossesA[:2], rtol=1e-6)

    set_seed(11)
    trB2 = _resume_trainer(resume_dataset, tmp_path, "B", num_epochs=4,
                           resume=True)
    lossesB2, _, _ = trB2.train()
    assert trB2.start_epoch == 2
    # restored params were re-placed with the DP sharding, not one device
    leaf = jax.tree_util.tree_leaves(trB2.params)[0]
    assert len(leaf.sharding.device_set) == 8
    # the resumed epochs reproduce the uninterrupted run
    np.testing.assert_allclose(lossesB2, lossesA[2:], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(trA.params)),
                    jax.tree_util.tree_leaves(jax.device_get(trB2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("parallel", [dict(spatial_parallel=2),
                                      dict(tensor_parallel=2),
                                      dict(pipeline_parallel=2)],
                         ids=["sp2", "tp2", "pp2"])
def test_resume_continues_training_under_sp_tp(mesh, tmp_path,
                                               resume_dataset, parallel):
    """Kill-and-resume must also hold under spatial/tensor/pipeline
    parallelism: _place_state re-places restored params per the trainer's
    mode (replication on the grid/pipe meshes; model-axis weight sharding
    under tp)."""
    from nps_tpu.utils.seed import set_seed

    tag = next(iter(parallel))[:2]
    # pipeline parallelism needs >= 2 homogeneous stages
    blocks = 2 if "pipeline_parallel" in parallel else 1
    set_seed(13)
    trA = _resume_trainer(resume_dataset, tmp_path, tag + "A", num_epochs=3,
                          parallel=parallel, blocks=blocks)
    lossesA, _, _ = trA.train()

    set_seed(13)
    trB = _resume_trainer(resume_dataset, tmp_path, tag + "B", num_epochs=2,
                          parallel=parallel, blocks=blocks)
    lossesB, _, _ = trB.train()
    assert np.allclose(lossesB, lossesA[:2], rtol=1e-6)
    set_seed(13)
    trB2 = _resume_trainer(resume_dataset, tmp_path, tag + "B", num_epochs=3,
                           resume=True, parallel=parallel, blocks=blocks)
    lossesB2, _, _ = trB2.train()
    assert trB2.start_epoch == 2
    # restored params live on the full mesh, not one device
    leaf = jax.tree_util.tree_leaves(trB2.params)[0]
    assert len(leaf.sharding.device_set) == 8
    np.testing.assert_allclose(lossesB2, lossesA[2:], rtol=1e-5)


def test_resume_preserves_best_model_tracking(mesh, tmp_path, resume_dataset,
                                              monkeypatch):
    """A resumed run must continue min_val_loss tracking: with a checkpoint
    recording an unbeatable best, the post-resume validation must NOT
    overwrite the best-model export (VERDICT r2 weak #3)."""
    import pickle

    from nps_tpu.utils.seed import set_seed

    set_seed(13)
    tr = _resume_trainer(resume_dataset, tmp_path, "C", num_epochs=2)
    tr.train()
    ckpt = tr._ckpt_path()
    with open(ckpt, "rb") as f:
        state = pickle.load(f)
    state["min_val_loss"] = {"default": 0.0}  # unbeatable sentinel
    with open(ckpt, "wb") as f:
        pickle.dump(state, f)

    set_seed(13)
    tr2 = _resume_trainer(resume_dataset, tmp_path, "C", num_epochs=4,
                          resume=True)
    saved = []
    monkeypatch.setattr(type(tr2), "save_model",
                        lambda self, name: saved.append(name))
    tr2.train()
    assert tr2._resumed_min_val_loss == {"default": 0.0}
    # only the final export fires; no best-model overwrite happened
    assert [s for s in saved if s.endswith("_default")] == []
    assert any(s.endswith("_final") for s in saved)
