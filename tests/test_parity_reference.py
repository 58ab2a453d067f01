"""Golden full-model parity vs the PyTorch reference (weight transplant).

For each twophase model family, build the reference model and the nps_tpu
model from the same config, transplant the reference weights via
``nps_tpu.compat``, and require forward outputs (through the full physics
activation wrapper) to agree. This is the acceptance gate for BASELINE.md's
"per-step losses within 1e-3" requirement at the single-forward level.

Runs only where /root/reference is mounted; skipped elsewhere.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.ref_loader import reference_available, load_reference

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not available")

import torch  # noqa: E402

import nps_tpu.models as models  # noqa: E402
from nps_tpu.compat import convert_state_dict  # noqa: E402
from nps_tpu.compat.torch_weights import assert_params_match_structure  # noqa: E402
from nps_tpu.pde import PDE2D  # noqa: E402


TW = 25
NX1, NX2 = 96, 64
N_STATIC, N_SPATIAL = 2, 2


def model_cfg(name):
    """The four twophase model configs (cfg_twophase_*.py model dicts),
    minus the wrapper/object keys."""
    base = dict(
        model_class="EncProcDec",
        num_c=1, num_spatial_dims=2, time_window=TW, data_structure="grid",
        processor_residual=False, encoder="enc_grid.ElementWise",
        activation=torch.nn.GELU(),
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step")
    if name == "drn":
        return dict(base, processor="DilatedResnet", kernel_size=5,
                    hidden_blocks=2, hidden_features=128,
                    padding_mode="circular", dec_kernel_size=5,
                    dec_padding_mode="circular")
    if name == "unet":
        return dict(base, processor="UNetModern", ch_mults=[2, 2, 1, 2],
                    is_attn=[False] * 4, mid_attn=False, hidden_features=32,
                    norm=True, use1x1=True, cond_mode="concat",
                    padding_mode="circular", dec_kernel_size=5,
                    dec_padding_mode="circular")
    if name == "ufno":
        return dict(base, processor="UFNO", fno_modes=10, hidden_blocks=3,
                    hidden_features=192, fno_kernel_size=1,
                    fno_conv_mode="single", padding_mode="circular",
                    ch_mults=[1, 1], is_attn=[False, False], mid_attn=False,
                    norm=True, use1x1=True)
    if name == "ufno_fno":
        return dict(base, processor=[dict(object="FNO"), dict(object="UFNO")],
                    hidden_blocks=1, fno_modes=10, hidden_features=192,
                    fno_kernel_size=1, fno_conv_mode="single",
                    padding_mode="circular", ch_mults=[1, 1],
                    is_attn=[False, False], mid_attn=False, norm=True,
                    use1x1=True)
    raise ValueError(name)


WRAPPER_CFG = dict(
    activation_final=torch.nn.Tanh(), enforce_spatial_cond=True,
    spatial_cond_channel=0, approx_volume_preserve=True,
    approx_volume_preserve_mode="individual_static", max_pct_dif=1 / 25)


def make_pdes():
    _, ref_pdes = load_reference()
    kw = dict(tmin=0.0, tmax=10.0, nt=501, L1=1.0, L2=0.66, nx1=NX1, nx2=NX2,
              x=None, name="twophase", n_cond_static=N_STATIC,
              n_cond_dynamic=0, n_cond_spatial=N_SPATIAL)
    return PDE2D(**kw), ref_pdes.PDE2D(**kw)


def make_inputs(b=2, seed=0):
    rng = np.random.default_rng(seed)
    u = (rng.random((b, 1, TW, NX1, NX2)) + 0.5).astype(np.float32)
    cond = rng.random((b, N_STATIC)).astype(np.float32)
    sc = np.zeros((b, N_SPATIAL, NX1, NX2), np.float32)
    sc[:, 0, 10:20, 10:20] = 1.0  # obstacle block
    sc[:, 1] = rng.random((b, NX1, NX2)).astype(np.float32)
    return u, cond, sc


@pytest.mark.parametrize("name", ["drn", "unet", "ufno", "ufno_fno"])
def test_forward_parity(name):
    import copy

    ref_models, _ = load_reference()
    pde, ref_pde = make_pdes()
    cfg = model_cfg(name)
    # the reference's create_model pops 'object' keys from spec dicts in
    # place -> give each side its own copy
    cfg_ref = copy.deepcopy(cfg)
    cfg_ref["activation"] = cfg["activation"]
    cfg = {**copy.deepcopy(cfg), "activation": cfg["activation"]}
    u, cond, sc = make_inputs()
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (u.shape[0], NX1, NX2, 2)).copy()

    torch.manual_seed(0)
    ref_model = ref_models.activation_wrapper(**cfg_ref, **WRAPPER_CFG,
                                              pde=ref_pde)
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(
            torch.tensor(u), cond=torch.tensor(cond), bc=None,
            pos=torch.tensor(pos), t_cond=None,
            spatial_cond=torch.tensor(sc)).numpy()

    my_model = models.activation_wrapper(**cfg, **WRAPPER_CFG, pde=pde)
    init_params = my_model.init(jax.random.PRNGKey(0), u, cond=cond,
                                pos=pos, spatial_cond=sc)
    params = convert_state_dict(ref_model.state_dict())
    params = {"params": {"inner": params["params"]}}
    assert_params_match_structure(params, init_params)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    with jax.default_matmul_precision("highest"):
        out = jax.jit(my_model.apply)(params, u, cond=cond, pos=pos,
                                      spatial_cond=sc)
    out = np.asarray(out)

    assert out.shape == ref_out.shape
    err = np.max(np.abs(out - ref_out))
    denom = np.max(np.abs(ref_out)) + 1e-12
    assert err / denom < 1e-4, f"max abs err {err} (rel {err / denom})"


def test_rollout_parity_ufno():
    """Multi-step autoregressive rollout parity: feed predictions back as
    inputs for several bundled steps (the regime where error compounds;
    BASELINE.md requires agreement within 1e-3)."""
    import copy

    ref_models, _ = load_reference()
    pde, ref_pde = make_pdes()
    cfg = model_cfg("ufno")
    cfg_ref = {**copy.deepcopy(cfg), "activation": cfg["activation"]}
    cfg = {**copy.deepcopy(cfg), "activation": cfg["activation"]}
    u, cond, sc = make_inputs(b=1, seed=3)
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (1, NX1, NX2, 2)).copy()

    torch.manual_seed(0)
    ref_model = ref_models.activation_wrapper(**cfg_ref, **WRAPPER_CFG,
                                              pde=ref_pde)
    ref_model.eval()
    n_steps = 4
    with torch.no_grad():
        pred_t = torch.tensor(u)
        for _ in range(n_steps):
            pred_t = ref_model(pred_t, cond=torch.tensor(cond), bc=None,
                               pos=torch.tensor(pos), t_cond=None,
                               spatial_cond=torch.tensor(sc))
        ref_out = pred_t.numpy()

    my_model = models.activation_wrapper(**cfg, **WRAPPER_CFG, pde=pde)
    params = convert_state_dict(ref_model.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray,
                                    {"params": {"inner": params["params"]}})

    with jax.default_matmul_precision("highest"):
        @jax.jit
        def roll(params, u):
            def body(pred, _):
                pred = my_model.apply(params, pred, cond=cond, pos=pos,
                                      spatial_cond=sc)
                return pred, None
            pred, _ = jax.lax.scan(body, u, None, length=n_steps)
            return pred

        out = np.asarray(roll(params, jnp.asarray(u)))

    denom = np.abs(ref_out).max() + 1e-12
    err = np.abs(out - ref_out).max()
    # nRMSE-style metric over the rollout
    nrmse = np.sqrt(np.mean((out - ref_out) ** 2)) / (np.sqrt(
        np.mean(ref_out ** 2)) + 1e-12)
    assert nrmse < 1e-3, f"rollout nRMSE {nrmse}"
    assert err / denom < 5e-3, f"rollout max rel err {err / denom}"


def test_gradient_parity_drn():
    """Backward-pass parity: gradients of sqrt(sum-MSE) w.r.t. every
    parameter must match torch autograd with transplanted weights (validates
    conv/crop/volume-preserve VJPs end to end)."""
    import copy

    ref_models, _ = load_reference()
    pde, ref_pde = make_pdes()
    cfg = model_cfg("drn")
    cfg_ref = {**copy.deepcopy(cfg), "activation": cfg["activation"]}
    cfg = {**copy.deepcopy(cfg), "activation": cfg["activation"]}
    u, cond, sc = make_inputs(b=2, seed=4)
    rng = np.random.default_rng(5)
    labels = (rng.random(u.shape) + 0.5).astype(np.float32)
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (2, NX1, NX2, 2)).copy()

    torch.manual_seed(0)
    ref_model = ref_models.activation_wrapper(**cfg_ref, **WRAPPER_CFG,
                                              pde=ref_pde)
    ref_model.train()
    crit = torch.nn.MSELoss(reduction="sum")
    pred = ref_model(torch.tensor(u), cond=torch.tensor(cond), bc=None,
                     pos=torch.tensor(pos), t_cond=None,
                     spatial_cond=torch.tensor(sc))
    loss_t = torch.sqrt(crit(pred, torch.tensor(labels)))
    loss_t.backward()
    ref_grads = {k: v.grad.numpy() for k, v in
                 ref_model.named_parameters() if v.grad is not None}

    my_model = models.activation_wrapper(**cfg, **WRAPPER_CFG, pde=pde)
    params = convert_state_dict(ref_model.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray,
                                    {"params": {"inner": params["params"]}})

    def loss_fn(params):
        out = my_model.apply(params, u, cond=cond, pos=pos, spatial_cond=sc)
        return jnp.sqrt(jnp.sum((out - labels) ** 2))

    with jax.default_matmul_precision("highest"):
        loss_j, grads = jax.jit(jax.value_and_grad(loss_fn))(params)

    assert abs(float(loss_j) - float(loss_t)) / float(loss_t) < 1e-5

    # compare through the same name translation used for the weights
    g_conv = convert_state_dict(ref_grads)
    g_conv = {"params": {"inner": g_conv["params"]}}
    flat_my = {tuple(str(k.key) for k in p): v for p, v in
               jax.tree_util.tree_flatten_with_path(grads)[0]}
    flat_ref = {tuple(str(k.key) for k in p): v for p, v in
                jax.tree_util.tree_flatten_with_path(g_conv)[0]}
    assert set(flat_ref) <= set(flat_my)
    checked = 0
    for k, gr in flat_ref.items():
        gm = np.asarray(flat_my[k])
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gm, gr, rtol=5e-3, atol=2e-4 * scale,
                                   err_msg=str(k))
        checked += 1
    assert checked > 20


def test_training_dynamics_parity_drn():
    """Multi-step training parity: from a transplanted init, N Adam steps on
    the SAME fixed batch must produce the same loss trajectory as torch
    (torch.optim.Adam vs nps_tpu.train.optim) — closing the gap between
    "transplanted weights match" and "training matches"."""
    import copy

    from nps_tpu.train.optim import build_optimizer

    ref_models, ref_pdes = load_reference()
    tw, nx1, nx2 = 5, 24, 16
    kw = dict(tmin=0.0, tmax=10.0, nt=51, L1=1.0, L2=0.66, nx1=nx1, nx2=nx2,
              x=None, name="twophase", n_cond_static=N_STATIC,
              n_cond_dynamic=0, n_cond_spatial=N_SPATIAL)
    pde, ref_pde = PDE2D(**kw), ref_pdes.PDE2D(**kw)

    cfg = dict(
        model_class="EncProcDec", num_c=1, num_spatial_dims=2, time_window=tw,
        data_structure="grid", processor_residual=False,
        encoder="enc_grid.ElementWise", activation=torch.nn.GELU(),
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        processor="DilatedResnet", kernel_size=3, hidden_blocks=1,
        hidden_features=16, padding_mode="circular", dec_kernel_size=3,
        dec_padding_mode="circular")
    wrapper = dict(WRAPPER_CFG, max_pct_dif=1 / tw)

    rng = np.random.default_rng(11)
    b = 2
    u = (rng.random((b, 1, tw, nx1, nx2)) + 0.5).astype(np.float32)
    labels = (rng.random(u.shape) + 0.5).astype(np.float32)
    cond = rng.random((b, N_STATIC)).astype(np.float32)
    sc = np.zeros((b, N_SPATIAL, nx1, nx2), np.float32)
    sc[:, 0, 4:8, 4:8] = 1.0
    sc[:, 1] = rng.random((b, nx1, nx2)).astype(np.float32)
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (b, nx1, nx2, 2)).copy()
    lr = 1e-4
    n_steps = 5

    # ---- torch trajectory ----
    torch.manual_seed(3)
    ref_model = ref_models.activation_wrapper(**copy.deepcopy(cfg), **wrapper,
                                              pde=ref_pde)
    ref_model.train()
    opt = torch.optim.Adam(ref_model.parameters(), lr=lr)
    crit = torch.nn.MSELoss(reduction="sum")
    losses_ref = []
    for _ in range(n_steps):
        opt.zero_grad()
        pred = ref_model(torch.tensor(u), cond=torch.tensor(cond), bc=None,
                         pos=torch.tensor(pos), t_cond=None,
                         spatial_cond=torch.tensor(sc))
        loss = torch.sqrt(crit(pred, torch.tensor(labels)))
        loss.backward()
        opt.step()
        losses_ref.append(float(loss))

    # ---- nps_tpu trajectory from the transplanted init ----
    my_model = models.activation_wrapper(**copy.deepcopy(cfg), **wrapper,
                                         pde=pde)
    # recover the (pre-training) torch init by re-seeding identically
    torch.manual_seed(3)
    ref_init = ref_models.activation_wrapper(**copy.deepcopy(cfg), **wrapper,
                                             pde=ref_pde)
    params = convert_state_dict(ref_init.state_dict())
    params = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"inner": params["params"]}})
    tx, _ = build_optimizer(object="optim.Adam", lr=lr)
    opt_state = tx.init(params)

    def loss_fn(params):
        out = my_model.apply(params, u, cond=cond, pos=pos, spatial_cond=sc)
        return jnp.sqrt(jnp.sum((out - labels) ** 2))

    @jax.jit
    def step(params, opt_state):
        with jax.default_matmul_precision("highest"):
            loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, d: p + d, params, updates)
        return params, opt_state, loss

    losses_my = []
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
        losses_my.append(float(loss))

    np.testing.assert_allclose(losses_my, losses_ref, rtol=2e-3)
    # trajectories should actually be training (loss strictly decreasing)
    assert losses_ref[-1] < losses_ref[0]


def small_model_cfg(name, tw):
    """Tiny per-family configs sharing the cfg_twophase_* structure."""
    base = dict(
        model_class="EncProcDec", num_c=1, num_spatial_dims=2, time_window=tw,
        data_structure="grid", processor_residual=False,
        encoder="enc_grid.ElementWise", activation=torch.nn.GELU(),
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step")
    if name == "ufno":
        return dict(base, processor="UFNO", fno_modes=4, hidden_blocks=1,
                    hidden_features=16, fno_kernel_size=1,
                    fno_conv_mode="single", padding_mode="circular",
                    ch_mults=[1, 1], is_attn=[False, False], mid_attn=False,
                    norm=True, use1x1=True)
    if name == "unet":
        return dict(base, processor="UNetModern", ch_mults=[2, 2, 1, 2],
                    is_attn=[False] * 4, mid_attn=False, hidden_features=16,
                    norm=True, use1x1=True, cond_mode="concat",
                    padding_mode="circular", dec_kernel_size=3,
                    dec_padding_mode="circular")
    if name == "ufno_fno":
        return dict(base, processor=[dict(object="FNO"), dict(object="UFNO")],
                    hidden_blocks=1, fno_modes=4, hidden_features=16,
                    fno_kernel_size=1, fno_conv_mode="single",
                    padding_mode="circular", ch_mults=[1, 1],
                    is_attn=[False, False], mid_attn=False, norm=True,
                    use1x1=True)
    raise ValueError(name)


@pytest.mark.parametrize("name", ["ufno", "unet", "ufno_fno"])
def test_training_dynamics_parity_pushforward(name):
    """VERDICT r3 #3: training-dynamics parity beyond DRN, over a long
    horizon WITH pushforward. From a transplanted init, 20 Adam steps —
    each drawing a shared random start window from a trajectory and
    unrolling the pushforward no-grad depth of a fixed [0,1,2,...] cycle —
    plus MultiStepLR stepping, must track torch's loss trajectory. This
    exercises exactly the spectral / GroupNorm / transpose-conv gradient
    paths over repeated optimizer steps
    (``src/trainers/autoregressivepushforwardtrainer.py:43-162``)."""
    import copy

    from nps_tpu.train.optim import (build_lr_scheduler, build_optimizer,
                                     set_learning_rate)

    ref_models, ref_pdes = load_reference()
    # the reference 4-level UNet tower rejects small grids (its cond-grid
    # pyramid keeps halving): 64x48 is its measured minimum here
    tw = 5
    nx1, nx2 = (64, 48) if name == "unet" else (24, 16)
    t_res = 30
    kw = dict(tmin=0.0, tmax=10.0, nt=t_res, L1=1.0, L2=0.66, nx1=nx1,
              nx2=nx2, x=None, name="twophase", n_cond_static=N_STATIC,
              n_cond_dynamic=0, n_cond_spatial=N_SPATIAL)
    pde, ref_pde = PDE2D(**kw), ref_pdes.PDE2D(**kw)
    cfg = small_model_cfg(name, tw)
    wrapper = dict(WRAPPER_CFG, max_pct_dif=1 / tw)

    rng = np.random.default_rng(21)
    b = 2
    # a smooth synthetic trajectory (blobby, like the workload) so the
    # pushforward predictions stay in-distribution over 20 steps
    t = np.linspace(0, 1, t_res, dtype=np.float32)
    xx = np.linspace(0, 1, nx1, dtype=np.float32)[:, None]
    yy = np.linspace(0, 1, nx2, dtype=np.float32)[None, :]
    u = np.zeros((b, 1, t_res, nx1, nx2), np.float32)
    for bi in range(b):
        cx, cy, v = rng.uniform(0.2, 0.8, 3).astype(np.float32)
        for ti in range(t_res):
            u[bi, 0, ti] = np.exp(
                -((xx - (cx + 0.3 * v * t[ti])) ** 2 +
                  (yy - cy) ** 2) / 0.02) * 0.9
    cond = rng.random((b, N_STATIC)).astype(np.float32)
    sc = np.zeros((b, N_SPATIAL, nx1, nx2), np.float32)
    sc[:, 0, 4:8, 4:8] = 1.0
    sc[:, 1] = rng.random((b, nx1, nx2)).astype(np.float32)
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (b, nx1, nx2, 2)).copy()

    n_steps = 20
    depths = [(0, 1, 2)[i % 3] for i in range(n_steps)]
    # shared per-step start (one draw per optimizer step, valid for the
    # step's depth: start in [tw, t_res - tw*(depth+1)])
    starts = [int(rng.integers(tw, t_res - tw * (d + 1) + 1))
              for d in depths]
    lr = 1e-3
    lr_step_interval = 5  # scheduler steps at optimizer steps 5,10,15
    milestones, gamma = [1, 2], 0.4

    # ---- torch trajectory (the reference train-step math, inlined with
    # the shared starts/depths; process_step is a no-op for twophase) ----
    torch.manual_seed(7)
    ref_model = ref_models.activation_wrapper(**copy.deepcopy(cfg), **wrapper,
                                              pde=ref_pde)
    ref_model.train()
    opt = torch.optim.Adam(ref_model.parameters(), lr=lr)
    sched_t = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=milestones,
                                                   gamma=gamma)
    crit = torch.nn.MSELoss(reduction="sum")
    u_t, cond_t = torch.tensor(u), torch.tensor(cond)
    pos_t, sc_t = torch.tensor(pos), torch.tensor(sc)
    losses_ref = []
    for i in range(n_steps):
        s, d = starts[i], depths[i]
        data = u_t[:, :, s - tw:s]
        with torch.no_grad():
            for k in range(d):
                data = ref_model(data, cond=cond_t, bc=None, pos=pos_t,
                                 t_cond=None, spatial_cond=sc_t)
        labels = u_t[:, :, s + tw * d:s + tw * (d + 1)]
        opt.zero_grad()
        pred = ref_model(data, cond=cond_t, bc=None, pos=pos_t, t_cond=None,
                         spatial_cond=sc_t)
        loss = torch.sqrt(crit(pred, labels))
        loss.backward()
        opt.step()
        losses_ref.append(float(loss))
        if (i + 1) % lr_step_interval == 0:
            sched_t.step()

    # ---- nps_tpu trajectory from the transplanted init ----
    my_model = models.activation_wrapper(**copy.deepcopy(cfg), **wrapper,
                                         pde=pde)
    torch.manual_seed(7)
    ref_init = ref_models.activation_wrapper(**copy.deepcopy(cfg), **wrapper,
                                             pde=ref_pde)
    params = convert_state_dict(ref_init.state_dict())
    params = jax.tree_util.tree_map(
        jnp.asarray, {"params": {"inner": params["params"]}})
    tx, base_lr = build_optimizer(object="optim.Adam", lr=lr)
    sched = build_lr_scheduler(base_lr, object="MultiStepLR",
                               milestones=milestones, gamma=gamma)
    opt_state = tx.init(params)

    u_j = jnp.asarray(u)
    step_fns = {}

    def make_step(depth):
        def step(params, opt_state, data, labels):
            with jax.default_matmul_precision("highest"):
                d = data
                for _ in range(depth):
                    d = jax.lax.stop_gradient(my_model.apply(
                        params, d, cond=cond, pos=pos, spatial_cond=sc))

                def loss_fn(params):
                    pred = my_model.apply(params, d, cond=cond, pos=pos,
                                          spatial_cond=sc)
                    return jnp.sqrt(jnp.sum((pred - labels) ** 2))

                loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, g: p + g, params,
                                            updates)
            return params, opt_state, loss
        return jax.jit(step)

    losses_my = []
    for i in range(n_steps):
        s, d = starts[i], depths[i]
        if d not in step_fns:
            step_fns[d] = make_step(d)
        data = u_j[:, :, s - tw:s]
        labels = u_j[:, :, s + tw * d:s + tw * (d + 1)]
        params, opt_state, loss = step_fns[d](params, opt_state, data, labels)
        losses_my.append(float(loss))
        if (i + 1) % lr_step_interval == 0:
            sched.step()
            opt_state = set_learning_rate(opt_state, sched.lr)

    np.testing.assert_allclose(losses_my, losses_ref, rtol=5e-3)
    # both sides must actually train on the task over the horizon
    assert np.mean(losses_ref[-5:]) < np.mean(losses_ref[:5])
