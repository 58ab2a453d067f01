"""Mixture-of-Spectral-Experts FNO + expert parallelism on the virtual
CPU mesh.

The reference has no MoE (SURVEY.md §2.6 listed expert parallelism as a
non-goal for that reason); ``nps_tpu/models/moe_fno.py`` adds the expert
dimension as a conditioning-gated soft mixture of FNO layers and
``nps_tpu/parallel/expert.py`` shards that axis over an ("data", "expert")
mesh through GSPMD. These tests pin:

- the E=1 degenerate case EXACTLY equals a plain FNO (weight transplant);
- expert-sharded forward and gradients equal the unsharded ones;
- the shipped trainer runs end-to-end under ``expert_parallel``;
- the gate is a proper distribution and actually modulates the output.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import nps_tpu.models as models
from nps_tpu.models.activations import GELU
from nps_tpu.parallel.expert import (expert_partition_specs, make_dp_ep_mesh,
                                     shard_expert_params)
from nps_tpu.pde import PDE2D


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_dp_ep_mesh(4, jax.devices()[:8])  # 2 DP rows x 4 experts


def _pde2d(nx=16):
    return PDE2D(tmin=0.0, tmax=10.0, nt=21, L1=1.0, L2=1.0, nx1=nx, nx2=nx,
                 x=None, name="twophase", n_cond_static=2, n_cond_dynamic=0,
                 n_cond_spatial=2)


def _moe_model(pde, tw, n_experts, processor="MoEFNO"):
    return models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor=processor, n_experts=n_experts, fno_modes=4,
        hidden_blocks=2, hidden_features=16, fno_kernel_size=1,
        fno_conv_mode="single", padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)


def _batch(pde, b, tw, nx, seed=0):
    rng = np.random.default_rng(seed)
    u = (rng.random((b, 1, tw, nx, nx)) * 0.9).astype(np.float32)
    cond = rng.random((b, 2)).astype(np.float32)
    sc = (rng.random((b, 2, nx, nx)) > 0.8).astype(np.float32)
    pos = rng.random((b, nx, nx, 2)).astype(np.float32)
    return u, cond, sc, pos


def test_moe_e1_equals_plain_fno():
    """n_experts=1: softmax gate == 1, so the block must reduce EXACTLY to
    FNO_Layer — proven by transplanting plain-FNO weights into the expert
    slots and comparing bitwise."""
    tw, nx, b = 5, 16, 4
    pde = _pde2d(nx)
    m1 = _moe_model(pde, tw, n_experts=1)
    mf = _moe_model(pde, tw, n_experts=None, processor="FNO")
    u, cond, sc, pos = _batch(pde, b, tw, nx)
    pf = jax.device_get(mf.init(jax.random.PRNGKey(1), u, cond=cond,
                                pos=pos, spatial_cond=sc))
    p1 = jax.device_get(m1.init(jax.random.PRNGKey(2), u, cond=cond,
                                pos=pos, spatial_cond=sc))
    for blk in range(2):
        src = pf["params"]["processor_0"][f"fno_layers_{blk}"]
        dst = p1["params"]["processor_0"][f"experts_{blk}"]
        p1["params"]["processor_0"][f"experts_{blk}"] = \
            jax.tree_util.tree_map(
                lambda dd, ss: ss[None].astype(dd.dtype), dst, src)
    p1["params"]["encoder"] = pf["params"]["encoder"]
    p1["params"]["decoder"] = pf["params"]["decoder"]
    o1 = jax.jit(m1.apply)(p1, u, cond=cond, pos=pos, spatial_cond=sc)
    of = jax.jit(mf.apply)(pf, u, cond=cond, pos=pos, spatial_cond=sc)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(of))


def test_expert_partition_specs(mesh):
    """Every leaf under experts_* is sharded on its leading (E) axis;
    everything else is replicated."""
    pde = _pde2d()
    model = _moe_model(pde, 5, n_experts=4)
    u, cond, sc, pos = _batch(pde, 4, 5, 16)
    params = model.init(jax.random.PRNGKey(0), u, cond=cond, pos=pos,
                        spatial_cond=sc)
    specs = expert_partition_specs(params["params"], 4)
    proc = specs["processor_0"]
    for leaf in jax.tree_util.tree_leaves(
            proc["experts_0"], is_leaf=lambda x: isinstance(x, P)):
        assert leaf[0] == "expert"
    for leaf in jax.tree_util.tree_leaves(
            proc["gate_0"], is_leaf=lambda x: isinstance(x, P)):
        assert leaf == P()
    for leaf in jax.tree_util.tree_leaves(
            specs["encoder"], is_leaf=lambda x: isinstance(x, P)):
        assert leaf == P()


def test_expert_specs_reject_non_divisible_stack():
    """n_experts not divisible by the expert-mesh extent must fail loudly,
    not silently replicate (K-times-redundant compute with no sharding)."""
    params = {"processor_0": {"experts_0": {"kernel": np.zeros((2, 3, 3))}}}
    with pytest.raises(ValueError, match="n_experts"):
        expert_partition_specs(params, 4)


def test_expert_sharded_matches_unsharded(mesh):
    """Forward + gradients with experts sharded over the mesh equal the
    unsharded results (GSPMD partitions the vmapped experts and psums the
    gate contraction)."""
    tw, nx, b = 5, 16, 4
    pde = _pde2d(nx)
    model = _moe_model(pde, tw, n_experts=4)
    u, cond, sc, pos = _batch(pde, b, tw, nx, seed=1)
    params = model.init(jax.random.PRNGKey(1), u, cond=cond, pos=pos,
                        spatial_cond=sc)
    ref = jax.jit(model.apply)(params, u, cond=cond, pos=pos,
                               spatial_cond=sc)
    sp = shard_expert_params(params, mesh)
    us = jax.device_put(jnp.asarray(u), NamedSharding(mesh, P("data")))
    out = jax.jit(model.apply)(sp, us, cond=cond, pos=pos, spatial_cond=sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # the expert leaves really live distributed over the expert axis
    leaf = sp["params"]["processor_0"]["experts_0"]["w"]["kernel"]
    assert len(leaf.sharding.device_set) == 8

    def loss(p, uu):
        return jnp.sum(model.apply(p, uu, cond=cond, pos=pos,
                                   spatial_cond=sc) ** 2)

    g1 = jax.jit(jax.grad(loss))(params, jnp.asarray(u))
    g2 = jax.jit(jax.grad(loss))(sp, us)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(b_) / scale,
                                   np.asarray(a) / scale, atol=1e-5)


def test_gate_modulates_output():
    """The gate responds to the conditioning: different cond vectors give
    different expert mixtures, and the mixture changes the output."""
    tw, nx, b = 5, 16, 2
    pde = _pde2d(nx)
    model = _moe_model(pde, tw, n_experts=4)
    u, cond, sc, pos = _batch(pde, b, tw, nx, seed=2)
    params = model.init(jax.random.PRNGKey(2), u, cond=cond, pos=pos,
                        spatial_cond=sc)
    o1 = jax.jit(model.apply)(params, u, cond=cond, pos=pos,
                              spatial_cond=sc)
    o2 = jax.jit(model.apply)(params, u, cond=cond + 2.0, pos=pos,
                              spatial_cond=sc)
    # conditioning changes flow through both the concat and the gate
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-6


def test_moe_no_conditioning_pools_gate():
    """Without a conditioning vector the gate pools the hidden state."""
    tw, nx, b = 5, 16, 2
    pde = PDE2D(tmin=0.0, tmax=10.0, nt=21, L1=1.0, L2=1.0, nx1=nx, nx2=nx,
                x=None, name="nocond", n_cond_static=0, n_cond_dynamic=0,
                n_cond_spatial=0)
    model = _moe_model(pde, tw, n_experts=2)
    rng = np.random.default_rng(3)
    u = rng.random((b, 1, tw, nx, nx), dtype=np.float32)
    pos = rng.random((b, nx, nx, 2), dtype=np.float32)
    params = model.init(jax.random.PRNGKey(3), u, pos=pos)
    out = jax.jit(model.apply)(params, u, pos=pos)
    assert out.shape == u.shape and np.isfinite(np.asarray(out)).all()


def test_trainer_expert_parallel_end_to_end(mesh, tmp_path):
    """Shipped trainer with expert_parallel=4: one train step equals the
    single-device step (same init/batch/key), and a full train() runs."""
    from nps_tpu.data.pipeline import device_put_batch
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.train import (AutoregressivePushforwardTrainer,
                               build_criterion)

    d = tmp_path / "twophase"
    generate(str(d), n_sims=16, n_channels=2, nt=21, nx1=16, nx2=16, seed=8)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")
    tw = 5

    def make_trainer(ep):
        return AutoregressivePushforwardTrainer(
            model=_moe_model(dataset.pde, tw, n_experts=4),
            data=dataset,
            criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
            optimizer=dict(object="optim.SGD", lr=1e-3), lr_scheduler=None,
            save_path=str(tmp_path / f"m{ep}"), time_window=tw,
            base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
            device="cpu", batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1,
            lr_step_interval=1, unrolling=1, print_interval=1,
            test_interval=1, process_settings={}, expert_parallel=ep)

    import random as py_random

    tr1 = make_trainer(0)
    tr2 = make_trainer(4)
    assert tr2.ep == 4 and dict(tr2.mesh.shape) == {"data": 2, "expert": 4}
    loader = tr1.get_dataloaders()[0]
    batch = next(iter(loader))
    tr1.ensure_initialized(loader)
    tr2.params = tr2._place_state(jax.device_get(tr1.params))
    tr2._build_optimizer()

    py_random.seed(0)
    loss1, _ = tr1.train_step(device_put_batch(batch, None),
                              epoch=1, batch_idx=0, loader=None)
    py_random.seed(0)
    loss2, _ = tr2.train_step(device_put_batch(batch, tr2.sharding),
                              epoch=1, batch_idx=0, loader=None)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)

    # full train() through validation/test under EP
    tr3 = make_trainer(4)
    train_losses, _, _ = tr3.train()
    assert np.isfinite(train_losses[0])
