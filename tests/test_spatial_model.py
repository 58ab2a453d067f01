"""Spatial (grid) sharding through the FULL model on the virtual CPU mesh.

SURVEY.md §7 step 8: the first spatial dimension of the field is sharded
over the "x" axis of a 2-D ("data", "x") mesh; XLA's SPMD partitioner
inserts the halo exchanges for the stencil convs, the psums for the
truncated-DFT spectral contractions (reference spectral math:
``src/models/enc_proc_dec_components/proc_fno.py:255-288``) and the
GroupNorm statistics. The model code is unchanged — these tests prove the
sharded full-model forward and the sharded trainer step match the
single-device results.
"""

import numpy as np
import pytest
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from nps_tpu.parallel import GridBatchSharding, make_grid_mesh, replicate


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_grid_mesh(4, jax.devices()[:8])  # 2 DP rows x 4 spatial cols


def _build_ufno(pde, tw):
    import nps_tpu.models as models
    from nps_tpu.models.activations import GELU, Tanh

    return models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / tw,
        num_c=1, num_spatial_dims=2, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="UFNO", fno_modes=4, hidden_blocks=1, hidden_features=16,
        fno_kernel_size=1, fno_conv_mode="single", padding_mode="circular",
        ch_mults=[1, 1], is_attn=[False, False], mid_attn=False, norm=True,
        use1x1=True, decoder="dec_grid.TimeConvDense",
        dec_delta_mode="per_step", pde=pde)


def test_sharded_ufno_forward_matches_single_device(mesh):
    """Full U-FNO forward (spectral DFT + U-Net + physics wrapper) with the
    batch AND the first spatial dim sharded == the unsharded forward."""
    from nps_tpu.pde import PDE2D

    tw, nx = 5, 16
    b = 4
    pde = PDE2D(tmin=0.0, tmax=10.0, nt=21, L1=1.0, L2=1.0, nx1=nx, nx2=nx,
                x=None, name="twophase", n_cond_static=2, n_cond_dynamic=0,
                n_cond_spatial=2)
    model = _build_ufno(pde, tw)

    rng = np.random.default_rng(0)
    u = (rng.random((b, 1, tw, nx, nx)) * 0.9).astype(np.float32)
    cond = rng.random((b, 2)).astype(np.float32)
    sc = np.zeros((b, 2, nx, nx), np.float32)
    sc[:, 0, 2:4, 2:4] = 1.0
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (b, nx, nx, 2)).copy()

    params = jax.jit(model.init)(jax.random.PRNGKey(0), u, cond=cond,
                                 pos=pos, spatial_cond=sc)

    def fwd(params, u, cond, pos, sc):
        return model.apply(params, u, cond=cond, pos=pos, spatial_cond=sc)

    out_single = np.asarray(jax.jit(fwd)(params, u, cond, pos, sc))

    sh = GridBatchSharding(mesh)
    us = jax.device_put(u, NamedSharding(mesh, P("data", None, None, "x")))
    conds = jax.device_put(cond, NamedSharding(mesh, P("data")))
    poss = jax.device_put(pos, NamedSharding(mesh, P("data", "x")))
    scs = jax.device_put(sc, NamedSharding(mesh, P("data", None, "x")))
    params_r = replicate(params, mesh)
    out_sharded = np.asarray(jax.jit(fwd)(params_r, us, conds, poss, scs))

    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-5, atol=1e-5)
    del sh


def test_grid_batch_sharding_specs(mesh):
    """Role-based specs: fields shard on (data, x), vectors on data only,
    non-divisible spatial dims fall back to batch sharding."""
    sh = GridBatchSharding(mesh)
    u_base = np.zeros((0,), np.float32)
    u = np.zeros((4, 1, 10, 16, 16), np.float32)
    x = np.zeros((4, 16, 16, 2), np.float32)
    cond = np.zeros((4, 2), np.float32)
    t_cond = np.zeros((4, 0), np.float32)
    sc = np.zeros((4, 2, 16, 16), np.float32)
    staged = sh.shard_batch((u_base, u, x, cond, t_cond, sc))
    assert staged[1].sharding.spec == P("data", None, None, "x", None)
    assert staged[2].sharding.spec == P("data", "x", None, None)
    assert staged[5].sharding.spec == P("data", None, "x", None)
    assert staged[3].sharding.spec == P("data", None)

    # 15 rows don't divide by 4 -> x axis dropped, batch sharding kept
    u_odd = np.zeros((4, 1, 10, 15, 16), np.float32)
    staged = sh.shard_batch((u_base, u_odd, x, cond, t_cond, sc))
    assert staged[1].sharding.spec == P("data", None, None, None, None)


def test_spatial_trainer_step_matches_single_device(mesh, tmp_path):
    """One pushforward train step with spatial_parallel=4 must match the
    unsharded step (same batch/key): loss and updated params."""
    import nps_tpu.models as models
    from nps_tpu.data.pipeline import device_put_batch
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.models.activations import GELU
    from nps_tpu.train import (AutoregressivePushforwardTrainer,
                               build_criterion)

    d = tmp_path / "twophase"
    generate(str(d), n_sims=12, n_channels=2, nt=21, nx1=16, nx2=16, seed=5)
    dataset = PDE2DDataset(
        base_path=str(tmp_path), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")
    tw = 5

    def make_trainer(n_spatial):
        model = models.EncProcDec(
            num_c=1, num_spatial_dims=2, time_window=tw,
            encoder="enc_grid.ElementWise", activation=GELU(),
            processor="UFNO", fno_modes=4, hidden_blocks=1,
            hidden_features=16, fno_kernel_size=1, fno_conv_mode="single",
            padding_mode="circular", ch_mults=[1, 1],
            is_attn=[False, False], norm=True, use1x1=True,
            decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
            pde=dataset.pde)
        return AutoregressivePushforwardTrainer(
            model=model, data=dataset,
            criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
            # SGD keeps the param delta linear in the gradient: Adam's
            # rsqrt(v)+eps at step 1 amplifies the (benign) psum
            # reduction-order noise of the sharded step into O(lr) flips
            # on near-zero gradients
            optimizer=dict(object="optim.SGD", lr=1e-3), lr_scheduler=None,
            save_path=str(tmp_path / f"m{n_spatial}"), time_window=tw,
            base_resolution=(21, 16, 16), super_resolution=(21, 16, 16),
            device="cpu", batch_size=8, nr_gt_steps=1, nw=0, num_epochs=1,
            lr_step_interval=1, unrolling=1, print_interval=1,
            test_interval=1, process_settings={},
            spatial_parallel=n_spatial)

    tr1 = make_trainer(0)
    tr2 = make_trainer(4)
    assert tr2.mesh.shape == {"data": 2, "x": 4}
    loader = tr1.get_dataloaders()[0]
    batch = next(iter(loader))
    tr1.ensure_initialized(loader)
    tr2.params = replicate(jax.device_get(tr1.params), tr2.mesh)
    tr2._build_optimizer()

    b1 = device_put_batch(batch, None)
    b2 = device_put_batch(batch, tr2.sharding)
    # the unroll depth is drawn from the global host RNG inside train_step;
    # pin it so both trainers take the same depth
    import random

    random.seed(123)
    loss1, _ = tr1.train_step(b1, epoch=1, batch_idx=0, loader=None)
    random.seed(123)
    loss2, _ = tr2.train_step(b2, epoch=1, batch_idx=0, loader=None)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
