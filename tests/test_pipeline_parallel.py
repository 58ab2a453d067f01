"""Pipeline parallelism (GPipe over the "pipe" mesh axis) on the virtual
CPU mesh.

SURVEY.md §2.6 declared PP a reference non-goal; ``nps_tpu.parallel
.pipeline`` closes the row anyway: the EncProcDec processor chain is a
homogeneous stack of stages (UFNO/DRN/FNO blocks, or equal processor-list
entries), streamed over the "pipe" axis with shard_map + ppermute
microbatching. These tests pin the pipelined apply to the sequential
``model.apply`` (forward AND gradients) and run the shipped trainer with
``pipeline_parallel`` against the single-device step.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nps_tpu.models as models
from nps_tpu.models.activations import GELU, Tanh
from nps_tpu.parallel.pipeline import make_dp_pp_mesh, make_pipelined_apply
from nps_tpu.pde import PDE1D, PDE2D


@pytest.fixture(scope="module")
def mesh4():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_dp_pp_mesh(4, jax.devices()[:8])  # 2 DP rows x 4 pipe cols


@pytest.fixture(scope="module")
def mesh2():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_dp_pp_mesh(2, jax.devices()[:8])  # 4 DP rows x 2 pipe cols


def _pde2d(nx=16):
    return PDE2D(tmin=0.0, tmax=10.0, nt=21, L1=1.0, L2=1.0, nx1=nx, nx2=nx,
                 x=None, name="twophase", n_cond_static=2, n_cond_dynamic=0,
                 n_cond_spatial=2)


def _wrapped_ufno(pde, tw, blocks):
    return models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / tw,
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="UFNO", fno_modes=4, hidden_blocks=blocks,
        hidden_features=16, fno_kernel_size=1, fno_conv_mode="single",
        padding_mode="circular", ch_mults=[1, 1], is_attn=[False, False],
        mid_attn=False, norm=True, use1x1=True,
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)


def _batch2d(pde, b, tw, nx, seed=0):
    rng = np.random.default_rng(seed)
    u = (rng.random((b, 1, tw, nx, nx)) * 0.9).astype(np.float32)
    cond = rng.random((b, 2)).astype(np.float32)
    sc = (rng.random((b, 2, nx, nx)) > 0.8).astype(np.float32)
    pos = rng.random((b, nx, nx, 2)).astype(np.float32)
    return u, cond, sc, pos


def _assert_grads_close(g_ref, g_pp, rtol=2e-4):
    """Per-leaf relative comparison (grad magnitudes here reach ~1e5, so an
    absolute tolerance is meaningless)."""
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pp)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=rtol)


def test_pipelined_ufno_forward_matches_sequential(mesh4):
    """Wrapped U-FNO (4 blocks) pipelined over 4 stages x 2 DP rows equals
    the sequential apply — including the physics-wrapper replay."""
    tw, nx, b = 5, 16, 4
    pde = _pde2d(nx)
    model = _wrapped_ufno(pde, tw, blocks=4)
    u, cond, sc, pos = _batch2d(pde, b, tw, nx)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(u), cond=cond,
                        pos=pos, spatial_cond=sc)
    ref = model.apply(params, jnp.asarray(u), cond=cond, pos=pos,
                      spatial_cond=sc)

    pp = make_pipelined_apply(model, mesh4)
    out = jax.jit(pp)(params, jnp.asarray(u), cond, None, pos, None, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipelined_grads_match_sequential(mesh4):
    tw, nx, b = 5, 16, 4
    pde = _pde2d(nx)
    model = _wrapped_ufno(pde, tw, blocks=4)
    u, cond, sc, pos = _batch2d(pde, b, tw, nx, seed=1)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(u), cond=cond,
                        pos=pos, spatial_cond=sc)
    pp = make_pipelined_apply(model, mesh4)

    def loss_seq(p):
        return jnp.sum(model.apply(p, jnp.asarray(u), cond=cond, pos=pos,
                                   spatial_cond=sc) ** 2)

    def loss_pp(p):
        return jnp.sum(pp(p, jnp.asarray(u), cond, None, pos, None, sc) ** 2)

    g_ref = jax.jit(jax.grad(loss_seq))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    _assert_grads_close(g_ref, g_pp)


def test_pipeline_microbatch_knob(mesh4):
    """n_micro=2 (microbatch size 2 on a local batch of 4... local batch is
    b/2=2 per DP row here, so n_micro=2 -> single-sample microbatches) still
    equals sequential."""
    tw, nx, b = 5, 16, 4
    pde = _pde2d(nx)
    model = _wrapped_ufno(pde, tw, blocks=4)
    u, cond, sc, pos = _batch2d(pde, b, tw, nx, seed=2)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(u), cond=cond,
                        pos=pos, spatial_cond=sc)
    ref = model.apply(params, jnp.asarray(u), cond=cond, pos=pos,
                      spatial_cond=sc)
    pp = make_pipelined_apply(model, mesh4, n_micro=2)
    out = jax.jit(pp)(params, jnp.asarray(u), cond, None, pos, None, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipelined_drn_blocks(mesh2):
    """DilatedResnet block-granularity stages (residual inside each block)."""
    tw, nx, b = 5, 16, 8
    pde = _pde2d(nx)
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="DilatedResnet", kernel_size=3, hidden_blocks=2,
        hidden_features=8, padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)
    u, cond, sc, pos = _batch2d(pde, b, tw, nx, seed=3)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(u), cond=cond,
                        pos=pos, spatial_cond=sc)
    ref = model.apply(params, jnp.asarray(u), cond=cond, pos=pos,
                      spatial_cond=sc)
    pp = make_pipelined_apply(model, mesh2)
    out = jax.jit(pp)(params, jnp.asarray(u), cond, None, pos, None, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipelined_processor_list_with_residual(mesh2):
    """Homogeneous processor LIST ([FNO, FNO]) -> one stage per processor,
    honoring processor_residual between stages."""
    tw, nx, b = 5, 16, 4
    pde = _pde2d(nx)
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor=[dict(object="FNO"), dict(object="FNO")],
        processor_residual=True,
        fno_modes=4, hidden_blocks=1, hidden_features=16,
        fno_kernel_size=1, fno_conv_mode="single", padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)
    u, cond, sc, pos = _batch2d(pde, b, tw, nx, seed=4)
    params = model.init(jax.random.PRNGKey(4), jnp.asarray(u), cond=cond,
                        pos=pos, spatial_cond=sc)
    ref = model.apply(params, jnp.asarray(u), cond=cond, pos=pos,
                      spatial_cond=sc)
    pp = make_pipelined_apply(model, mesh2)
    out = jax.jit(pp)(params, jnp.asarray(u), cond, None, pos, None, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipelined_bc_encoder_path(mesh2):
    """1D FNO with a BCEncoder: the conditioning-embedding glue (bc concat +
    encoder MLP) replays identically inside the pipelined apply."""
    tw, nx, b = 5, 32, 4
    pde = PDE1D(tmin=0, tmax=4.0, nt=41, L=16.0, nx=nx, x=None,
                name="DIV1Dish", n_cond_static=1, n_cond_dynamic=2)
    model = models.EncProcDec(
        pde=pde, encoder="enc_grid.ElementWise",
        processor="FNO", decoder="dec_grid.TimeConvDense",
        bc_encoder=dict(object="BCEncoder", bc_encoder_out=4,
                        bc_encoder_hidden=8, bc_encoder_kernel=3),
        num_c=2, num_spatial_dims=1, time_window=tw, activation=GELU(),
        hidden_features=16, fno_modes=4, hidden_blocks=2)
    rng = np.random.default_rng(5)
    u = rng.random((b, 2, tw, nx), dtype=np.float32)
    cond = rng.random((b, 1), dtype=np.float32)
    bc = rng.random((b, 2, tw), dtype=np.float32)
    pos = np.broadcast_to(pde.x[None], (b, nx)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(5), u, cond=cond, bc=bc, pos=pos)
    ref = model.apply(params, u, cond=cond, bc=bc, pos=pos)
    pp = make_pipelined_apply(model, mesh2)
    out = jax.jit(pp)(params, jnp.asarray(u), cond, bc, pos, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipelined_moe_blocks(mesh2):
    """MoEFNO block-granularity stages (experts + gate travel together)."""
    tw, nx, b = 5, 16, 4
    pde = _pde2d(nx)
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="MoEFNO", n_experts=2, fno_modes=4, hidden_blocks=2,
        hidden_features=16, fno_kernel_size=1, fno_conv_mode="single",
        padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)
    u, cond, sc, pos = _batch2d(pde, b, tw, nx, seed=6)
    params = model.init(jax.random.PRNGKey(6), jnp.asarray(u), cond=cond,
                        pos=pos, spatial_cond=sc)
    ref = model.apply(params, jnp.asarray(u), cond=cond, pos=pos,
                      spatial_cond=sc)
    pp = make_pipelined_apply(model, mesh2)
    out = jax.jit(pp)(params, jnp.asarray(u), cond, None, pos, None, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_rejects_heterogeneous_chain(mesh2):
    pde = _pde2d()
    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=5,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor=[dict(object="FNO"), dict(object="UFNO")],
        fno_modes=4, hidden_blocks=1, hidden_features=16,
        fno_kernel_size=1, fno_conv_mode="single", padding_mode="circular",
        ch_mults=[1, 1], is_attn=[False, False], norm=True, use1x1=True,
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)
    with pytest.raises(ValueError, match="identical"):
        make_pipelined_apply(model, mesh2)


def test_pipeline_rejects_never_dividing_microbatches(tmp_path):
    """pipeline_microbatches that can never divide the steady-state
    per-data-rank batch must fail at trainer setup — otherwise EVERY batch
    silently routes through the sequential (unpipelined) fallback."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.train import (AutoregressivePushforwardTrainer,
                               build_criterion)

    d = tmp_path / "twophase"
    generate(str(d), n_sims=8, n_channels=2, nt=21, nx1=16, nx2=16, seed=3)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[1], name="twophase")
    tw = 5
    model = _wrapped_ufno(dataset.pde, tw, blocks=2)
    # 8 devices / pp=2 -> 4 data ranks; batch 8 -> b_loc=2; 2 % 3 != 0
    with pytest.raises(ValueError, match="microbatches"):
        AutoregressivePushforwardTrainer(
            model=model, data=dataset,
            criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
            optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
            save_path=str(tmp_path / "model"), time_window=tw,
            base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
            device="cpu", batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1,
            lr_step_interval=1, unrolling=1, print_interval=1,
            test_interval=1, process_settings={},
            pipeline_parallel=2, pipeline_microbatches=3)


def test_pp_train_step_matches_single_device(mesh4, tmp_path):
    """One shipped pushforward train step under pipeline_parallel=4 (with
    2 DP rows) == the unsharded step: same loss, same updated params."""
    from nps_tpu.data.pipeline import device_put_batch
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.train import (AutoregressivePushforwardTrainer,
                               build_criterion)

    d = tmp_path / "twophase"
    generate(str(d), n_sims=12, n_channels=2, nt=21, nx1=16, nx2=16, seed=6)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")
    tw = 5

    def make_trainer(pp):
        model = models.EncProcDec(
            num_c=1, num_spatial_dims=2, time_window=tw,
            encoder="enc_grid.ElementWise", activation=GELU(),
            processor="UFNO", fno_modes=4, hidden_blocks=4,
            hidden_features=8, fno_kernel_size=1, fno_conv_mode="single",
            padding_mode="circular", ch_mults=[1, 1],
            is_attn=[False, False], mid_attn=False, norm=True, use1x1=True,
            decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
            pde=dataset.pde)
        # SGD, not Adam: the pipelined schedule reorders float ops, so
        # leaves whose true gradient is ~0 (e.g. shortcut biases whose
        # direction a downstream norm cancels) carry ~1e-8 rounding noise
        # that differs between the two schedules — Adam's m/sqrt(v) blows
        # that noise up to O(lr) updates. SGD keeps updates proportional
        # to gradients, so param equality actually tests the gradients.
        return AutoregressivePushforwardTrainer(
            model=model, data=dataset,
            criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
            optimizer=dict(object="optim.SGD", lr=1e-3), lr_scheduler=None,
            save_path=str(tmp_path / f"m{pp}"), time_window=tw,
            base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
            device="cpu", batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1,
            lr_step_interval=1, unrolling=1, print_interval=1,
            test_interval=1, process_settings={},
            pipeline_parallel=pp)

    tr1 = make_trainer(0)
    tr2 = make_trainer(4)
    assert tr2.pp == 4 and dict(tr2.mesh.shape) == {"data": 2, "pipe": 4}
    loader = tr1.get_dataloaders()[0]
    batch = next(iter(loader))
    tr1.ensure_initialized(loader)
    tr2.params = jax.device_get(tr1.params)
    from nps_tpu.parallel import replicate

    tr2.params = replicate(tr2.params, tr2.mesh)
    tr2._build_optimizer()

    b1 = device_put_batch(batch, None)
    b2 = device_put_batch(batch, tr2.sharding)
    # unrolling=1 at epoch>=1 exercises the pushforward scan THROUGH the
    # pipelined apply (stage streaming inside the no-grad rollout body).
    # train_step draws the unroll depth from the global host RNG — re-seed
    # before each call so both trainers draw the same depth
    import random as py_random

    py_random.seed(0)
    loss1, _ = tr1.train_step(b1, epoch=1, batch_idx=0, loader=None)
    py_random.seed(0)
    loss2, _ = tr2.train_step(b2, epoch=1, batch_idx=0, loader=None)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_trainer_pipeline_parallel_end_to_end(mesh2, tmp_path):
    """Full train() (train epoch + validation/test eval through the same
    pipelined apply) with pipeline_parallel=2 on the wrapped model."""
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.train import (AutoregressivePushforwardTrainer,
                               build_criterion)

    d = tmp_path / "twophase"
    generate(str(d), n_sims=16, n_channels=2, nt=21, nx1=16, nx2=16, seed=7)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[1], name="twophase")
    tw = 5
    model = _wrapped_ufno(dataset.pde, tw, blocks=2)
    tr = AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
        save_path=str(tmp_path / "model"), time_window=tw,
        base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
        device="cpu", batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1,
        lr_step_interval=1, unrolling=1, print_interval=1, test_interval=1,
        process_settings={}, pipeline_parallel=2, pipeline_microbatches=2)
    train_losses, val_losses, _ = tr.train()
    assert np.isfinite(train_losses[0])
    # val_losses: dict keyed by validation-split name
    flat = (sum((list(v) for v in val_losses.values()), [])
            if isinstance(val_losses, dict) else list(val_losses))
    assert flat and all(np.isfinite(v) for v in flat)
