"""--trainer.pushforward_fast: cheaper numerics INSIDE the no-grad
pushforward scan body only (bf16 GroupNorm statistics, tanh GELU).

The body's output is only the next window's input — never a gradient path —
so the tolerance is the pushforward method's own noise injection. These
tests pin the scoping:

- depth 0 (no scan body): the flag is a strict no-op — bitwise-equal loss;
- depth > 0: losses stay finite and close (the fast body perturbs the
  final grad step's *inputs* only slightly);
- the trace-time scope never leaks (fast_forward_active() False afterwards).
"""

import numpy as np
import jax
import pytest

import nps_tpu.models as models
from nps_tpu.models import config as model_config
from nps_tpu.models.activations import GELU


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from nps_tpu.data.synthetic import generate
    from nps_tpu.data.pde2d import PDE2DDataset

    d = tmp_path_factory.mktemp("pfds") / "twophase"
    generate(str(d), n_sims=10, n_channels=2, nt=26, nx1=16, nx2=16, seed=5)
    return PDE2DDataset(
        base_path=str(d.parent), experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")


def _trainer(dataset, tmp_path, tag, **extra):
    from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

    tw = 5
    # UFNO so the body exercises GroupNorm + GELU (the two fast-mode ops)
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
        num_epochs=1, lr_step_interval=1, unrolling=2, print_interval=1,
        test_interval=2, process_settings={}, **extra)


def _run_step(trainer, params0, batch, unrolled):
    u_base, u_super, x, cond, t_cond, sc = batch
    b, t_res = int(u_super.shape[0]), int(u_super.shape[2])
    fn = trainer._make_train_step(unrolled, b, t_res)
    params = jax.tree_util.tree_map(np.array, params0)
    opt_state = trainer.tx.init(params)
    params, opt_state, loss = fn(params, opt_state, u_super, x, cond,
                                 t_cond, sc, jax.random.PRNGKey(7))
    return float(loss), params


def test_pushforward_fast_scoping(dataset, tmp_path):
    tr = _trainer(dataset, tmp_path, "base")
    loader = tr.get_dataloaders()[0]
    batch = next(iter(loader))
    tr.ensure_initialized(loader)
    params0 = jax.device_get(tr.params)

    tr_fast = _trainer(dataset, tmp_path, "fast", pushforward_fast=True)
    tr_fast.params = tr_fast._place_state(params0)
    tr_fast._build_optimizer()

    # depth 0: no scan body -> the flag must be a strict no-op
    loss0, p0 = _run_step(tr, params0, batch, 0)
    loss0f, p0f = _run_step(tr_fast, params0, batch, 0)
    assert loss0 == loss0f
    for a, b_ in zip(jax.tree_util.tree_leaves(p0),
                     jax.tree_util.tree_leaves(p0f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # depth 2: finite, close (only the no-grad body numerics differ)
    loss2, _ = _run_step(tr, params0, batch, 2)
    loss2f, _ = _run_step(tr_fast, params0, batch, 2)
    assert np.isfinite(loss2f)
    assert abs(loss2f - loss2) <= 0.05 * abs(loss2) + 1e-6

    # the trace-time scope never leaks out of the builder
    assert not model_config.fast_forward_active()


def test_fast_forward_scope_restores_on_exception():
    try:
        with model_config.fast_forward_scope(True):
            assert model_config.fast_forward_active()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not model_config.fast_forward_active()
