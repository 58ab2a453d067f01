"""ZeRO-1 optimizer-state sharding on the virtual CPU mesh.

`--trainer.zero1=true` places the Adam/SGD moment tensors with a
PartitionSpec splitting their first data-divisible axis over "data"
(`nps_tpu/parallel/zero.py`); XLA's SPMD partitioner derives the
shard-update + all-gather schedule inside the existing jitted step. These
tests pin:

- moments are sharded before AND after a donated train step (the compiler
  keeps the ZeRO layout; nothing silently re-replicates);
- the step's loss and (under SGD, where updates are proportional to
  gradients) the updated params equal the unsharded run;
- resume re-places the restored opt state with the ZeRO sharding;
- the flag fails loudly without a mesh and under tensor parallelism.
"""

import numpy as np
import pytest
import jax

import nps_tpu.models as models
from nps_tpu.models.activations import GELU
from nps_tpu.parallel import make_mesh
from nps_tpu.parallel.zero import opt_state_specs
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset

    d = tmp_path_factory.mktemp("zds") / "twophase"
    generate(str(d), n_sims=12, n_channels=2, nt=21, nx1=16, nx2=16, seed=9)
    return PDE2DDataset(
        base_path=str(d.parent), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")


def _trainer(dataset, tmp_path, tag, optimizer="optim.Adam", zero1=False,
             dp=True, num_epochs=1, resume=False, **extra):
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
        optimizer=dict(object=optimizer, lr=1e-3), lr_scheduler=None,
        save_path=str(tmp_path / tag), time_window=tw,
        base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
        device="cpu", batch_size=8, nr_gt_steps=1, nw=0,
        num_epochs=num_epochs, lr_step_interval=1, unrolling=1,
        print_interval=1, test_interval=2, process_settings={},
        data_parallel=dp, zero1=zero1, resume=resume, **extra)


def _sharded_moment_leaves(opt_state, n=8):
    return [x for x in jax.tree_util.tree_leaves(opt_state)
            if hasattr(x, "sharding") and getattr(x, "ndim", 0) >= 1
            and x.shape[0] >= n and x.shape[0] % n == 0]


def test_zero1_step_matches_unsharded(mesh, dataset, tmp_path):
    """SGD step under zero1 == the plain DP step (loss and params); the
    moment tensors stay data-sharded through the donated update."""
    from nps_tpu.data.pipeline import device_put_batch
    import random as py_random

    tr1 = _trainer(dataset, tmp_path, "z0", optimizer="optim.SGD")
    tr2 = _trainer(dataset, tmp_path, "z1", optimizer="optim.SGD",
                   zero1=True)
    loader = tr1.get_dataloaders()[0]
    batch = next(iter(loader))
    tr1.ensure_initialized(loader)
    tr2.params = tr2._place_state(jax.device_get(tr1.params))
    tr2._build_optimizer()

    pre = _sharded_moment_leaves(tr2.opt_state)
    # SGD with momentum=0 carries no moment tensors; the trace state is
    # what gets sharded under Adam — check with Adam separately below if
    # this list is empty
    py_random.seed(0)
    l1, _ = tr1.train_step(device_put_batch(batch, None), 1, 0, None)
    py_random.seed(0)
    l2, _ = tr2.train_step(device_put_batch(batch, tr2.sharding), 1, 0, None)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
    del pre


def test_zero1_adam_moments_stay_sharded(mesh, dataset, tmp_path):
    """Adam: moments sharded over 'data' before AND after a donated step,
    and the step loss equals the plain DP step's."""
    from nps_tpu.data.pipeline import device_put_batch
    import random as py_random

    tr1 = _trainer(dataset, tmp_path, "a0")
    tr2 = _trainer(dataset, tmp_path, "a1", zero1=True)
    loader = tr1.get_dataloaders()[0]
    batch = next(iter(loader))
    tr1.ensure_initialized(loader)
    tr2.params = tr2._place_state(jax.device_get(tr1.params))
    tr2._build_optimizer()

    pre = _sharded_moment_leaves(tr2.opt_state)
    assert pre, "no shardable moment leaves found"
    assert all("data" in str(x.sharding.spec) for x in pre)

    py_random.seed(0)
    l1, _ = tr1.train_step(device_put_batch(batch, None), 1, 0, None)
    py_random.seed(0)
    l2, _ = tr2.train_step(device_put_batch(batch, tr2.sharding), 1, 0, None)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)

    post = _sharded_moment_leaves(tr2.opt_state)
    assert post and all("data" in str(x.sharding.spec) for x in post), \
        "ZeRO sharding lost through the donated update"


def test_zero1_resume_replaces_sharding(mesh, dataset, tmp_path):
    """Kill-and-resume under zero1 restores the moments SHARDED and
    reproduces the uninterrupted run's losses."""
    from nps_tpu.utils.seed import set_seed

    set_seed(17)
    trA = _trainer(dataset, tmp_path, "rA", zero1=True, num_epochs=3)
    lossesA, _, _ = trA.train()

    set_seed(17)
    trB = _trainer(dataset, tmp_path, "rB", zero1=True, num_epochs=2)
    trB.train()
    set_seed(17)
    trB2 = _trainer(dataset, tmp_path, "rB", zero1=True, num_epochs=3,
                    resume=True)
    lossesB2, _, _ = trB2.train()
    assert trB2.start_epoch == 2
    post = _sharded_moment_leaves(trB2.opt_state)
    assert post and all("data" in str(x.sharding.spec) for x in post)
    np.testing.assert_allclose(lossesB2, lossesA[2:], rtol=1e-5)


def test_zero1_requires_mesh_and_rejects_tp(dataset, tmp_path):
    with pytest.raises(ValueError, match="data"):
        tr = _trainer(dataset, tmp_path, "e0", zero1=True, dp=False)
        tr._zero1()
    if len(jax.devices()) >= 8:
        with pytest.raises(ValueError, match="tensor_parallel"):
            tr = _trainer(dataset, tmp_path, "e1", zero1=True, dp=False,
                          tensor_parallel=2)
            tr._zero1()
        # expert parallelism: tx.init already shards the moments on the
        # 'expert' axis; zero1 would force a per-step reshard — rejected
        with pytest.raises(ValueError, match="expert_parallel"):
            tr = _trainer(dataset, tmp_path, "e2", zero1=True, dp=False,
                          expert_parallel=2)
            tr._zero1()


def test_opt_state_specs_shapes(mesh):
    """Spec rule: first data-divisible axis sharded; scalars replicated."""
    import jax.numpy as jnp

    state = {"mu": jnp.zeros((16, 3)), "nu": jnp.zeros((3, 3, 8)),
             "count": jnp.zeros(()), "small": jnp.zeros((3,))}
    specs = opt_state_specs(state, mesh)
    assert specs["mu"] == P("data", None)
    assert specs["nu"] == P(None, None, "data")
    assert specs["count"] == P()
    assert specs["small"] == P()
