"""On-chip benchmark of the variable-time (D.sim1d_var_t) family.

VERDICT r3 weak #5: every shipped trainer path should have at least one
on-chip number. Drives the SHIPPED var-t path — ragged dataset, bucketing
batch sampler, min-crop train batches, max-pad masked eval — at the
cfg_var1d_fno shape and at a supersized nx=256 variant (the config's nx=32
is host-latency-bound on a TPU; 256 shows the path's device behavior).

Usage: python tools/bench_var_t.py [n_steps]
Prints one JSON line per shape.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def bench_shape(nx, hidden_features, n_steps, batch_size=8, tw=5):
    import jax

    import nps_tpu.models as models
    from nps_tpu.data.pde1d_var_t import PDE1DVarTDataset
    from nps_tpu.data.synthetic import generate_var_t
    from nps_tpu.models.activations import GELU
    from nps_tpu.models.config import set_compute_dtype
    from nps_tpu.train import (AutoregressivePushforwardTrainer,
                               build_criterion)

    set_compute_dtype("bfloat16")
    tmp = tempfile.mkdtemp(prefix="nps_vart_bench_")
    generate_var_t(os.path.join(tmp, "var1d"), n_sims=32, n_channels=2,
                   nx=nx, t_min=8 * tw, t_max=20 * tw, seed=11)
    dataset = PDE1DVarTDataset(
        base_path=tmp, experiment="var1d", conditioning="conditioning",
        split_file="split", name="var1d")
    model = models.EncProcDec(
        num_c=2, num_spatial_dims=1, time_window=tw,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="FNO", fno_modes=8, hidden_blocks=2,
        hidden_features=hidden_features, fno_kernel_size=1,
        fno_conv_mode="single", padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    trainer = AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-4), lr_scheduler=None,
        save_path=os.path.join(tmp, "b"), time_window=tw,
        base_resolution=(20 * tw, nx), super_resolution=(20 * tw, nx),
        batch_size=batch_size, nr_gt_steps=1, nw=0, num_epochs=1,
        lr_step_interval=10, unrolling=2, print_interval=1,
        test_interval=10, process_settings={},
        sampler=dict(object="VariableTimeBatchSampler",
                     with_replacement=True))

    train_loader, valid_loader, _ = trainer.get_dataloaders()
    batch = next(iter(train_loader))
    trainer.ensure_initialized(train_loader)

    out = {"nx": nx, "hidden_features": hidden_features,
           "batch": int(batch[1].shape[0]),
           "t_res_cropped": int(batch[1].shape[2])}
    for depth_src in ("depth0", "sampler"):
        loader = None if depth_src == "depth0" else train_loader
        loss, _ = trainer.train_step(batch, epoch=1, batch_idx=0,
                                     loader=loader)  # compile
        float(loss)
        t0 = time.perf_counter()
        for i in range(n_steps):
            loss, _ = trainer.train_step(batch, epoch=1, batch_idx=0,
                                         loader=loader)
        float(loss)
        dt = (time.perf_counter() - t0) / n_steps
        depth = (train_loader.batch_sampler.get_t_batch(0)
                 if loader is not None else 0)
        out[f"{depth_src}_unroll"] = int(depth)
        out[f"{depth_src}_samples_per_sec"] = round(
            batch[1].shape[0] / dt, 2)

    # masked max-pad eval (test_step computes per-step + rollout metrics)
    ebatch = next(iter(valid_loader))
    trainer.test_step(ebatch, batch_idx=0)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        main_loss, info = trainer.test_step(ebatch, batch_idx=0)
    out["eval_wall_s"] = round((time.perf_counter() - t0) / 3, 3)
    out["eval_unrolled_loss"] = float(main_loss)
    assert np.isfinite(main_loss)
    print(json.dumps(out), flush=True)
    return out


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from nps_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    bench_shape(nx=32, hidden_features=64, n_steps=n_steps)   # config shape
    bench_shape(nx=256, hidden_features=128, n_steps=n_steps)  # supersized


if __name__ == "__main__":
    main()
