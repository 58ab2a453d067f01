"""Trainer-level eval parity + remaining transplant-parity surfaces.

Closes the round-2 VERDICT gaps #1 and #6: nothing previously ran the
reference *trainer* (``src/trainers/autoregressivepushforwardtrainer.py``)
against nps_tpu's and compared the metric dicts — the /n_cells and /n_t
normalizations, BC plumbing between rollout steps, and the weighted
aggregation were "parity by code reading" only. Here both trainers run on
the same synthetic batch with transplanted weights and every metric must
agree:

- ``test_step``: per-step losses, "Unrolled forward losses", "Mean per-step
  loss", "Unrolled base losses" (reference ``:165-286,442-514``);
- ``simulate(compute_loss=True, include_data=True)``: losses AND frames
  (reference ``:288-440``);
- FiLM spectral conditioning (``proc_fno.py:209-218``), both transform
  modes;
- attention-enabled UNetModern incl. the placeholder-GroupNorm transplant
  (``proc_unet_modern.py:253-317``);
- the DIV1D BC path: ``process_step`` vs the reference
  ``utils/process_output.py:32-150`` for every BC mode and both model
  interfaces.

Runs only where /root/reference is mounted; skipped elsewhere.
"""

import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.ref_loader import reference_available, load_reference

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not available")

import torch  # noqa: E402

import nps_tpu.models as models  # noqa: E402
from nps_tpu.common.interfaces import D, M  # noqa: E402
from nps_tpu.compat import convert_state_dict  # noqa: E402
from nps_tpu.pde import PDE1D, PDE2D  # noqa: E402
from nps_tpu.train import (AutoregressivePushforwardTrainer,  # noqa: E402
                           build_criterion)

TW = 5
NT = 21
NX1, NX2 = 16, 16
N_STATIC, N_SPATIAL = 2, 2
B = 2


def _small_cfg():
    return dict(
        model_class="EncProcDec", num_c=1, num_spatial_dims=2, time_window=TW,
        data_structure="grid", processor_residual=False,
        encoder="enc_grid.ElementWise", activation=torch.nn.GELU(),
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        processor="DilatedResnet", kernel_size=3, hidden_blocks=1,
        hidden_features=16, padding_mode="circular", dec_kernel_size=3,
        dec_padding_mode="circular")


_WRAPPER = dict(
    activation_final=torch.nn.Tanh(), enforce_spatial_cond=True,
    spatial_cond_channel=0, approx_volume_preserve=True,
    approx_volume_preserve_mode="individual_static", max_pct_dif=1 / TW)


def _pde_pair():
    _, ref_pdes = load_reference()
    kw = dict(tmin=0.0, tmax=10.0, nt=NT, L1=1.0, L2=0.66, nx1=NX1, nx2=NX2,
              x=None, name="twophase", n_cond_static=N_STATIC,
              n_cond_dynamic=0, n_cond_spatial=N_SPATIAL)
    return PDE2D(**kw), ref_pdes.PDE2D(**kw)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    u_super = (rng.random((B, 1, NT, NX1, NX2)) + 0.5).astype(np.float32)
    u_base = (u_super + 0.05 * rng.standard_normal(u_super.shape)
              ).astype(np.float32)
    cond = rng.random((B, N_STATIC)).astype(np.float32)
    sc = np.zeros((B, N_SPATIAL, NX1, NX2), np.float32)
    sc[:, 0, 4:8, 4:8] = 1.0
    sc[:, 1] = rng.random((B, NX1, NX2)).astype(np.float32)
    return u_base, u_super, cond, sc


class _Adapter:
    """Minimal dataset stand-in: the trainers only need pde + interface."""

    def __init__(self, pde, data_interface):
        self.pde = pde
        self.data_interface = data_interface


_TRAINER_KW = dict(
    time_window=TW, base_resolution=(NT, NX1, NX2),
    super_resolution=(NT, NX1, NX2), nr_gt_steps=1, device="cpu",
    batch_size=B, process_settings={}, unrolling=0, lr_step_interval=1,
    print_interval=1, test_interval=1, num_epochs=1, nw=0)


def _build_pair(seed=0):
    """Reference trainer + nps_tpu trainer with transplanted weights."""
    ref_models, _ = load_reference()  # puts REF_PATH on sys.path

    import trainers as ref_trainers
    from common.interfaces import D as RefD
    pde, ref_pde = _pde_pair()
    cfg = _small_cfg()

    torch.manual_seed(seed)
    ref_model = ref_models.activation_wrapper(
        **copy.deepcopy(cfg), **_WRAPPER, pde=ref_pde)
    ref_model.eval()
    ref_tr = ref_trainers.AutoregressivePushforwardTrainer(
        model=ref_model, data=_Adapter(ref_pde, RefD.sim2d),
        criterion=torch.nn.MSELoss(reduction="sum"),
        optimizer=None, lr_scheduler=None, **copy.deepcopy(_TRAINER_KW))

    my_model = models.activation_wrapper(
        **copy.deepcopy(cfg), **_WRAPPER, pde=pde)
    my_tr = AutoregressivePushforwardTrainer(
        model=my_model, data=_Adapter(pde, D.sim2d),
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=None, lr_scheduler=None, **copy.deepcopy(_TRAINER_KW))
    params = convert_state_dict(ref_model.state_dict())
    my_tr.params = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"inner": params["params"]}})
    return ref_tr, my_tr, pde


def test_trainer_test_step_metric_parity():
    """The FULL test_step metric dict must match the reference trainer's:
    per-step losses (/batch), unrolled forward losses (/n_cells /n_t
    /batch, summed), mean per-step loss, and the numerical-baseline
    losses, all computed through the shipped trainers."""
    ref_tr, my_tr, pde = _build_pair()
    u_base, u_super, cond, sc = _batch(seed=1)
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (B, NX1, NX2, 2)).copy()

    batch_t = (torch.tensor(u_base), torch.tensor(u_super),
               torch.tensor(pos), torch.tensor(cond), torch.empty(0),
               torch.tensor(sc))
    with torch.no_grad():
        ref_loss, ref_info = ref_tr.test_step(batch_t, 0)

    batch_j = (jnp.asarray(u_base), jnp.asarray(u_super), jnp.asarray(pos),
               jnp.asarray(cond), jnp.zeros((0,)), jnp.asarray(sc))
    with jax.default_matmul_precision("highest"):
        my_loss, my_info = my_tr.test_step(batch_j, 0)

    assert set(float_keys(ref_info)) == set(float_keys(my_info))
    for k in float_keys(ref_info):
        rv, mv = float(ref_info[k]), float(my_info[k])
        assert abs(rv - mv) <= 1e-4 * max(abs(rv), 1.0), \
            f"{k}: ref {rv} vs nps_tpu {mv}"
    rv, mv = float(ref_loss), float(my_loss)
    assert abs(rv - mv) <= 1e-4 * max(abs(rv), 1.0)


def float_keys(info):
    return [k for k in info]


def test_trainer_simulate_parity():
    """simulate(compute_loss=True, include_data=True): the per-step loss
    list AND the collected ground-truth/prediction frames must match."""
    ref_tr, my_tr, pde = _build_pair(seed=2)
    _, u_super, cond, sc = _batch(seed=3)
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (B, NX1, NX2, 2)).copy()

    with torch.no_grad():
        ref_losses, (ref_gt, ref_pred) = ref_tr.simulate(
            torch.tensor(u_super), torch.tensor(cond), torch.tensor(pos),
            compute_loss=True, include_data=True, nr_gt_steps=1, t_res=NT,
            t_conditioning=torch.empty(0),
            spatial_conditioning=torch.tensor(sc))
    ref_losses = [float(l) for l in ref_losses]
    ref_gt = torch.cat(ref_gt, dim=2).numpy()
    ref_pred = torch.cat(ref_pred, dim=2).numpy()

    with jax.default_matmul_precision("highest"):
        my_losses, (my_gt, my_pred) = my_tr.simulate(
            u_super, cond, pos, compute_loss=True, include_data=True,
            nr_gt_steps=1, t_res=NT, t_conditioning=None,
            spatial_conditioning=sc)
    my_losses = [float(l) for l in my_losses]

    np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-4)
    np.testing.assert_array_equal(my_gt.shape, ref_gt.shape)
    np.testing.assert_allclose(my_gt, ref_gt, rtol=1e-5, atol=1e-5)
    denom = np.abs(ref_pred).max() + 1e-12
    assert np.abs(my_pred - ref_pred).max() / denom < 1e-4


class _ListLoader:
    """Iterable loader shim with the ``batch_size`` attr the reference
    trainer's test() inspects (``trainers/base.py:392-396``)."""

    def __init__(self, batches, batch_size):
        self.batches = batches
        self.batch_size = batch_size

    def __iter__(self):
        return iter(self.batches)


def test_trainer_test_weighted_aggregation_parity():
    """The full test() loop — batch-size-weighted metric aggregation over a
    loader with a RAGGED final batch (sizes 2,2,1) — must match the
    reference ``trainers/base.py:378-470``: loss and every metric weighted
    by batch size and divided by n_total, not averaged per batch."""
    ref_tr, my_tr, pde = _build_pair(seed=4)

    sizes = (2, 2, 1)
    batches_np = []
    for i, s in enumerate(sizes):
        u_base, u_super, cond, sc = _batch(seed=10 + i)
        pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                              (B, NX1, NX2, 2)).copy()
        batches_np.append(tuple(a[:s] for a in
                                (u_base, u_super, pos, cond,
                                 np.zeros((B, 0), np.float32), sc)))

    ref_loader = _ListLoader(
        [tuple(torch.tensor(a) for a in b) for b in batches_np], B)
    with torch.no_grad():
        ref_loss, ref_metrics = ref_tr.test(ref_loader)

    my_loader = _ListLoader(
        [tuple(jnp.asarray(a) for a in b) for b in batches_np], B)
    with jax.default_matmul_precision("highest"):
        my_loss, my_metrics = my_tr.test(my_loader)

    assert set(ref_metrics) == set(my_metrics)
    rv, mv = float(ref_loss), float(my_loss)
    assert abs(rv - mv) <= 1e-4 * max(abs(rv), 1.0)
    for k in ref_metrics:
        rv, mv = float(ref_metrics[k]), float(my_metrics[k])
        assert abs(rv - mv) <= 1e-4 * max(abs(rv), 1.0), \
            f"{k}: ref {rv} vs nps_tpu {mv}"


def test_film_processor_parity():
    """FNO processor with cond_mode='film' (transform mode 0, the mode the
    reference FNO wires; proc_fno.py:45-47,209-218), driven the only way
    the reference supports it: a direct processor call with ``variables``
    (the reference EncProcDec never forwards ``variables`` to processors —
    enc_proc_dec.py:176-178 — so full-model FiLM asserts upstream; both
    implementations share that contract)."""
    ref_models, ref_pdes = load_reference()
    kw = dict(tmin=0.0, tmax=8.0, nt=41, L=16.0, nx=32, x=None,
              name="filmtest", n_cond_static=N_STATIC, n_cond_dynamic=0)
    pde, ref_pde = PDE1D(**kw), ref_pdes.PDE1D(**kw)

    cfg = dict(num_spatial_dims=1, n_cond=N_STATIC, hidden_features=24,
               fno_modes=8, hidden_blocks=2, cond_mode="film",
               fno_kernel_size=1, fno_conv_mode="single",
               padding_mode="circular")
    rng = np.random.default_rng(7)
    h = rng.standard_normal((B, 24, 32)).astype(np.float32)
    cond = rng.random((B, N_STATIC)).astype(np.float32)

    torch.manual_seed(0)
    ref_model = ref_models.enc_proc_dec_components.FNO(
        pde=ref_pde, **copy.deepcopy(cfg))
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(h),
                            variables=torch.tensor(cond)).numpy()

    from nps_tpu.models.fno import FNO

    my_model = FNO(pde=pde, **copy.deepcopy(cfg))
    params = convert_state_dict(ref_model.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    h_cl = np.moveaxis(h, 1, -1)  # processor interior is channels-last
    with jax.default_matmul_precision("highest"):
        out = jax.jit(my_model.apply)(params, h_cl, cond)
    out = np.moveaxis(np.asarray(out), -1, 1)

    denom = np.abs(ref_out).max() + 1e-12
    assert np.abs(out - ref_out).max() / denom < 1e-4


def test_film_transform_mode_1_layer_parity():
    """transform_mode=1 ("activation * FiLM"; proc_fno.py:271-284) at the
    spectral-layer level, 1D and 2D, vs the reference SpectralConv."""
    import models.enc_proc_dec_components.proc_fno as ref_fno
    from nps_tpu.models.fno import SpectralConvND

    rng = np.random.default_rng(9)
    for nd, sp in [(1, (32,)), (2, (16, 12))]:
        modes = (6,) * nd
        cin, cout, fdim = 5, 7, 3
        x = rng.standard_normal((B, cin) + sp).astype(np.float32)
        p = rng.standard_normal((B, fdim)).astype(np.float32)

        torch.manual_seed(nd)
        ref_cls = {1: ref_fno.SpectralConv1d, 2: ref_fno.SpectralConv2d}[nd]
        ref = ref_cls(cin, cout, modes, feature_transform=True,
                      feature_transform_dim=fdim, transform_mode=1)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x), p=torch.tensor(p)).numpy()

        mine = SpectralConvND(in_channels=cin, out_channels=cout,
                              modes=modes, num_spatial_dims=nd,
                              feature_transform=True,
                              feature_transform_dim=fdim, transform_mode=1)
        sd = ref.state_dict()
        wparams = {
            f"weights{i + 1}": jnp.asarray(np.stack([
                sd[f"weights{i + 1}"].numpy().real,
                sd[f"weights{i + 1}"].numpy().imag]).astype(np.float32))
            for i in range({1: 1, 2: 2}[nd])}
        wparams["weights_feat"] = {
            "kernel": jnp.asarray(sd["weights_feat.weight"].numpy().T),
            "bias": jnp.asarray(sd["weights_feat.bias"].numpy())}
        x_cl = np.moveaxis(x, 1, -1)  # layer interior is channels-last
        with jax.default_matmul_precision("highest"):
            out = jax.jit(mine.apply)({"params": wparams}, x_cl, p)
        out = np.moveaxis(np.asarray(out), -1, 1)
        denom = np.abs(ref_out).max() + 1e-12
        assert np.abs(out - ref_out).max() / denom < 1e-4, f"nd={nd}"


def test_attention_unet_parity():
    """UNetModern with attention enabled (is_attn + mid_attn;
    proc_unet_modern.py:253-317) — exercises the softmax-over-queries quirk
    and the placeholder-GroupNorm weight transplant."""
    ref_models, _ = load_reference()
    pde, ref_pde = _pde_pair()
    cfg = dict(
        model_class="EncProcDec", num_c=1, num_spatial_dims=2, time_window=TW,
        data_structure="grid", processor_residual=False,
        encoder="enc_grid.ElementWise", activation=torch.nn.GELU(),
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        processor="UNetModern", ch_mults=[1, 2], is_attn=[True, True],
        mid_attn=True, hidden_features=16, norm=True, use1x1=True,
        cond_mode="concat", padding_mode="circular")

    rng = np.random.default_rng(5)
    u = (rng.random((B, 1, TW, NX1, NX2)) + 0.5).astype(np.float32)
    cond = rng.random((B, N_STATIC)).astype(np.float32)
    sc = rng.random((B, N_SPATIAL, NX1, NX2)).astype(np.float32)
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (B, NX1, NX2, 2)).copy()

    torch.manual_seed(1)
    cfg_ref = copy.deepcopy(cfg); cfg_ref.pop("model_class")
    ref_model = ref_models.EncProcDec(**cfg_ref, pde=ref_pde)
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(u), cond=torch.tensor(cond),
                            bc=None, pos=torch.tensor(pos), t_cond=None,
                            spatial_cond=torch.tensor(sc)).numpy()

    cfg_my = copy.deepcopy(cfg); cfg_my.pop("model_class")
    my_model = models.EncProcDec(**cfg_my, pde=pde)
    params = convert_state_dict(ref_model.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    with jax.default_matmul_precision("highest"):
        out = np.asarray(jax.jit(my_model.apply)(
            params, u, cond=cond, pos=pos, spatial_cond=sc))

    denom = np.abs(ref_out).max() + 1e-12
    assert np.abs(out - ref_out).max() / denom < 1e-4


@pytest.mark.parametrize("bc_mode", ["delta", "all_fixed_bc", "all", "simple"])
@pytest.mark.parametrize("interface", ["grid", "gnn"])
def test_div1d_process_step_parity(bc_mode, interface):
    """The DIV1D BC/min path vs the reference utils/process_output.py:32-150
    outputs: BC extraction (per mode and interface), BC injection, and the
    normalized min-clip, on the same random tensors."""
    _, ref_pdes = load_reference()  # puts REF_PATH on sys.path

    import utils.process_output as ref_po
    from common.interfaces import M as RefM

    from nps_tpu.utils.process_output import process_step

    if interface == "gnn" and bc_mode in ("all_fixed_bc", "all"):
        pytest.skip("reference raises NotImplementedError for these "
                    "GNN modes (process_output.py:123-126)")

    var_mean_sd = [(0.3, 0.8), (0.0, 1.0), (-0.2, 1.3), (0.5, 0.6)]
    pde = PDE1D(tmin=0, tmax=1, nt=11, L=1.0, nx=8, x=None, name="DIV1D",
                n_cond_static=0, n_cond_dynamic=0,
                var_mean_sd=var_mean_sd, bc_mode=bc_mode)
    ref_pde = ref_pdes.PDE1D(
        tmin=0, tmax=1, nt=11, L=1.0, nx=8, x=None, name="DIV1D",
        n_cond_static=0, n_cond_dynamic=0, var_mean_sd=var_mean_sd,
        bc_mode=bc_mode)

    mi, ref_mi = ((M.AR_TB, RefM.AR_TB) if interface == "grid"
                  else (M.AR_TB_GNN, RefM.AR_TB_GNN))

    rng = np.random.default_rng(17)
    sim = rng.standard_normal((B, 4, TW, 8)).astype(np.float32)
    gtbc_prev = rng.standard_normal((B, 4, TW, 8)).astype(np.float32)
    gtbc_next = rng.standard_normal((B, 4, TW, 8)).astype(np.float32)

    for get_bc, set_bc, set_min in [(True, False, False), (True, True, True),
                                    (False, True, True)]:
        # the reference's GNN branch runs on node-shaped tensors and never
        # reaches set_bc; grid layout keeps the comparison valid
        ref_sim, ref_bc = ref_po.process_step(
            pde=ref_pde, model_interface=ref_mi,
            sim_prev=torch.tensor(sim.copy()),
            gtbc_prev=torch.tensor(gtbc_prev.copy()),
            gtbc_next=torch.tensor(gtbc_next.copy()) if get_bc else None,
            device="cpu", get_bc=get_bc, set_bc=set_bc, set_min=set_min,
            process_settings={})
        my_sim, my_bc = process_step(
            pde, mi, jnp.asarray(sim), jnp.asarray(gtbc_prev),
            jnp.asarray(gtbc_next) if get_bc else None,
            get_bc=get_bc, set_bc=set_bc, set_min=set_min,
            process_settings={})
        np.testing.assert_allclose(np.asarray(my_sim), ref_sim.numpy(),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"sim {get_bc},{set_bc},{set_min}")
        if get_bc:
            np.testing.assert_allclose(
                np.asarray(my_bc), ref_bc.numpy(), rtol=1e-6, atol=1e-6,
                err_msg=f"bc {bc_mode} {interface}")
        else:
            assert my_bc is None and ref_bc is None
