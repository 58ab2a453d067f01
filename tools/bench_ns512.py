"""Single-chip capacity + throughput of the 512^2 stretch config.

Builds the cfg_ns512_ufno model spec verbatim (U-FNO, 128 feat, 3 blocks,
20 modes, ch_mults [1,1,1], remat="save_conv_outputs") and times the
shipped depth-1 train step at per-chip batch sizes, reporting XLA's
memory_analysis alongside. Measured 2026-08-17 on one v5e chip:

    batch 2: temps 11.73 GB -> 1.342 samples/s (1490 ms/step)
    batch 4: OOM (program needs 18.37 GB of 15.75 GB HBM; dominated by
             526^2 circular-Upsample-overshoot tensors at 1.5-1.9x lane
             padding — the same odd-size layout tax as at 128^2)

So the DP config's batch 8 over 8 chips (1/chip) has ~4 GB headroom/chip.

Run: python tools/bench_ns512.py [--batches=2,4]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX, TW, T_RES = 512, 25, 101


def build(batch):
    import jax

    import nps_tpu.models as models
    from __graft_entry__ import _example_batch
    from nps_tpu.common.interfaces import D
    from nps_tpu.models.activations import GELUTanh, Tanh
    from nps_tpu.models.config import set_compute_dtype
    from nps_tpu.pde import PDE2D
    from nps_tpu.train.losses import build_criterion
    from nps_tpu.train.pushforward import AutoregressivePushforwardTrainer

    set_compute_dtype("bfloat16")
    pde = PDE2D(tmin=0.0, tmax=10.0, nt=T_RES, L1=1.0, L2=1.0, nx1=NX,
                nx2=NX, x=None, name="ns512", n_cond_static=2,
                n_cond_dynamic=0, n_cond_spatial=2)
    model = models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=False, spatial_cond_channel=0,
        approx_volume_preserve=False,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / TW,
        num_c=1, num_spatial_dims=2, time_window=TW, data_structure="grid",
        processor_residual=False, encoder="enc_grid.ElementWise",
        activation=GELUTanh(),  # ships in cfg_ns512_ufno
        processor="UFNO", fno_modes=20, hidden_blocks=3,
        hidden_features=128, fno_kernel_size=1, fno_conv_mode="single",
        padding_mode="circular", ch_mults=[1, 1, 1],
        is_attn=[False, False, False], mid_attn=False, norm=True,
        use1x1=True, remat=True, remat_policy="save_conv_outputs",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)

    class _D:
        pass

    data = _D()
    data.pde = pde
    data.data_interface = D.sim2d
    trainer = AutoregressivePushforwardTrainer(
        model=model, data=data,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-4),
        time_window=TW, base_resolution=[T_RES, NX, NX], unrolling=4,
        lr_step_interval=25, nr_gt_steps=1, variable_time=False)
    u, cond, sc, pos = _example_batch(batch, TW, NX, NX, pde)
    rng = np.random.default_rng(1)
    u_traj = (rng.random((batch, 1, T_RES, NX, NX)) * 0.9).astype(np.float32)
    t_cond = np.zeros((batch, 0), np.float32)
    trainer.init_params((np.zeros((0,), np.float32),
                         u_traj[:, :, :2 * TW], pos, cond, t_cond, sc))
    db = tuple(jax.device_put(a) for a in (u_traj, pos, cond, t_cond, sc))
    return trainer, db


def main():
    import jax

    batches = (2, 4)
    for a in sys.argv[1:]:
        if a.startswith("--batches="):
            batches = tuple(int(x) for x in a.split("=", 1)[1].split(","))
    for batch in batches:
        trainer, (u_traj, pos, cond, t_cond, sc) = build(batch)
        fn = trainer._make_train_step(1, batch, T_RES)
        lowered = fn.lower(trainer.params, trainer.opt_state, u_traj, pos,
                           cond, t_cond, sc, jax.random.PRNGKey(0))
        try:
            exe = lowered.compile()
        except Exception as e:
            print(f"batch {batch}: COMPILE FAILED "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        m = exe.memory_analysis()
        print(f"batch {batch}: temps {m.temp_size_in_bytes / 1e9:.2f} GB, "
              f"args {m.argument_size_in_bytes / 1e9:.2f} GB", flush=True)
        p, o = trainer.params, trainer.opt_state
        for i in range(2):
            p, o, loss = exe(p, o, u_traj, pos, cond, t_cond, sc,
                             jax.random.PRNGKey(i))
        float(loss)
        t0 = time.perf_counter()
        n = 8
        for i in range(n):
            p, o, loss = exe(p, o, u_traj, pos, cond, t_cond, sc,
                             jax.random.PRNGKey(100 + i))
        float(loss)
        dt = (time.perf_counter() - t0) / n
        assert np.isfinite(float(loss))
        print(f"batch {batch}: {batch / dt:.3f} samples/s "
              f"({dt * 1e3:.0f} ms/step) at 512^2 depth-1", flush=True)


if __name__ == "__main__":
    main()
