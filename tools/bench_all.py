"""Benchmark the train step of all four twophase model families at 128^2.

Prints one JSON line per family (samples/sec/chip, bf16 + remat, batch 16,
pushforward depth 1).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TW, NX, BATCH, UNROLLED = 25, 128, 16, 1
T_RES = TW * (UNROLLED + 2) + 1


def family_kwargs(name):
    if name == "drn":
        return dict(processor="DilatedResnet", kernel_size=5, hidden_blocks=2,
                    hidden_features=128, padding_mode="circular",
                    dec_kernel_size=5, dec_padding_mode="circular")
    if name == "unet":
        return dict(processor="UNetModern", ch_mults=[2, 2, 1, 2],
                    is_attn=[False] * 4, mid_attn=False, hidden_features=32,
                    norm=True, use1x1=True, padding_mode="circular",
                    dec_kernel_size=5, dec_padding_mode="circular")
    if name == "ufno":
        return dict(processor="UFNO", fno_modes=10, hidden_blocks=3,
                    hidden_features=192, fno_kernel_size=1,
                    fno_conv_mode="single", padding_mode="circular",
                    ch_mults=[1, 1], is_attn=[False, False], norm=True,
                    use1x1=True)
    if name == "ufno_fno":
        return dict(processor=[dict(object="FNO"), dict(object="UFNO")],
                    hidden_blocks=1, fno_modes=10, hidden_features=192,
                    fno_kernel_size=1, fno_conv_mode="single",
                    padding_mode="circular", ch_mults=[1, 1],
                    is_attn=[False, False], norm=True, use1x1=True)
    raise ValueError(name)


def bench_family(name):
    import jax
    import jax.numpy as jnp

    import nps_tpu.models as models
    from nps_tpu.models.activations import GELU, Tanh
    from nps_tpu.models.config import set_compute_dtype
    from nps_tpu.pde import PDE2D
    from nps_tpu.train.losses import build_criterion
    from nps_tpu.train.optim import build_optimizer

    set_compute_dtype("bfloat16")
    pde = PDE2D(tmin=0.0, tmax=10.0, nt=501, L1=1.0, L2=0.66, nx1=NX, nx2=NX,
                x=None, name="twophase", n_cond_static=2, n_cond_spatial=2)
    model = models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / 25,
        num_c=1, num_spatial_dims=2, time_window=TW,
        encoder="enc_grid.ElementWise", activation=GELU(),
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=pde, **family_kwargs(name))

    rng = np.random.default_rng(0)
    u = (rng.random((BATCH, 1, TW, NX, NX)) * 0.9).astype(np.float32)
    cond = rng.random((BATCH, 2)).astype(np.float32)
    sc = np.zeros((BATCH, 2, NX, NX), np.float32)
    sc[:, 0, 4:8, 4:8] = 1.0
    pos = np.broadcast_to(np.asarray(pde.x, np.float32)[None],
                          (BATCH, NX, NX, 2)).copy()
    u_traj = jax.device_put(
        (rng.random((BATCH, 1, T_RES, NX, NX)) * 0.9).astype(np.float32))
    cond, sc, pos = map(jax.device_put, (cond, sc, pos))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), u, cond=cond,
                                 pos=pos, spatial_cond=sc)
    tx, _ = build_optimizer(object="optim.Adam", lr=1e-4)
    opt_state = jax.jit(tx.init)(params)
    crit = build_criterion(object="nn.MSELoss", reduction="sum")

    def train_step(params, opt_state, u_traj, cond, sc, pos, key):
        def loss_fn(params):
            s0 = jax.random.randint(key, (BATCH,), TW,
                                    T_RES - TW - TW * UNROLLED + 1)
            sl = jax.vmap(lambda ui, s: jax.lax.dynamic_slice_in_dim(
                ui, s - TW, 2 * TW, axis=1))(u_traj, s0)
            data, labels = sl[:, :, :TW], sl[:, :, TW:]
            for _ in range(UNROLLED):
                data = jax.lax.stop_gradient(model.apply(
                    params, data, cond=cond, pos=pos, spatial_cond=sc))
                s0 = s0 + TW
                labels = jax.vmap(lambda ui, s: jax.lax.dynamic_slice_in_dim(
                    ui, s, TW, axis=1))(u_traj, s0)
            pred = model.apply(params, data, cond=cond, pos=pos,
                               spatial_cond=sc)
            return jnp.sqrt(crit(pred, labels))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, d: p + d, params, upd)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    params, opt_state, loss = step(params, opt_state, u_traj, cond, sc, pos,
                                   jax.random.PRNGKey(0))
    float(loss)  # sync
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, u_traj, cond, sc,
                                       pos, jax.random.PRNGKey(i))
    float(loss)
    dt = (time.perf_counter() - t0) / n
    return BATCH / dt


def main():
    for name in ("drn", "unet", "ufno", "ufno_fno"):
        sps = bench_family(name)
        print(json.dumps({
            "metric": f"{name}_train_samples_per_sec_per_chip_128x128",
            "value": round(sps, 3), "unit": "samples/s"}), flush=True)


if __name__ == "__main__":
    main()
