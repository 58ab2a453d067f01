"""End-to-end input-pipeline + trainer-epoch throughput.

``bench.py`` measures the jitted device step alone; this tool closes the
loop around it:

- ``--host-only``: HostDataLoader + collate rate on the host (no device),
  i.e. how fast the loader can assemble batches of full trajectories.
- default: wall-clock samples/sec of ``trainer.train_one_epoch`` — the
  SHIPPED epoch path (loader -> prefetch thread -> device_put -> jitted
  train step) — on a synthetic twophase-shaped dataset at the production
  128^2 / t_res 251 shape, batch 16, U-FNO flagship model.
- ``--cache=device`` runs the same epoch with the device-resident dataset
  cache (``DeviceCacheLoader``): the whole train split is staged into HBM
  once and per-batch "loading" becomes an on-device gather, removing the
  per-batch host->device trajectory copy entirely.

The gap between this number and bench.py's step rate is the input
pipeline tax. NOTE: on the axon platform H2D copies cross a network
tunnel, so the un-cached tax here is an upper bound vs a co-located host.

Run: python tools/bench_pipeline.py [--host-only] [--cache=device]
     [--n-sims=48] [--epochs=2]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TW = 25
NX = 128
T_RES = 251          # tw * (8 + 2) + 1, the bench.py rollout span
BATCH = 16


def make_dataset(n_sims):
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.data.synthetic import generate

    root = tempfile.mkdtemp(prefix="nps_tpu_bench_data_")
    d = os.path.join(root, "twophase")
    generate(d, n_sims=n_sims, n_channels=1, nt=T_RES, nx1=NX, nx2=NX,
             seed=7)
    return PDE2DDataset(
        base_path=root, experiment="twophase", data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[0], name="twophase")


def bench_host_loader(dataset, epochs=3):
    from nps_tpu.data.pipeline import HostDataLoader

    loader = HostDataLoader(dataset.train, BATCH, shuffle=True, seed=0)
    n = 0
    for batch in loader:  # warm the page cache
        n += batch[1].shape[0]
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            pass
    dt = time.perf_counter() - t0
    rate = epochs * n / dt
    gbps = rate * batch[1][0].nbytes / 1e9
    print(f"host loader: {rate:.1f} samples/s ({gbps:.2f} GB/s collated)")
    return rate


def build_trainer(dataset, remat=False):
    import nps_tpu.models as models
    from nps_tpu.models.activations import GELU, Tanh
    from nps_tpu.models.config import set_compute_dtype
    from nps_tpu.train.losses import build_criterion
    from nps_tpu.train.pushforward import AutoregressivePushforwardTrainer

    set_compute_dtype("bfloat16")
    model = models.activation_wrapper(
        model_class="EncProcDec", activation_final=Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static",
        max_pct_dif=1 / TW, num_c=1, num_spatial_dims=2, time_window=TW,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="UFNO", fno_modes=10, hidden_blocks=3,
        remat=remat, remat_policy="save_conv_outputs" if remat else None,
        hidden_features=192, fno_kernel_size=1, fno_conv_mode="single",
        padding_mode="circular", ch_mults=[1, 1],
        is_attn=[False, False], mid_attn=False, norm=True, use1x1=True,
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    return AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-4),
        time_window=TW, base_resolution=[T_RES, NX, NX],
        batch_size=BATCH, unrolling=1, lr_step_interval=1, nr_gt_steps=1,
        num_epochs=4, variable_time=False)


def bench_epoch(dataset, epochs=2, cache=None, remat=False):
    trainer = build_trainer(dataset, remat=remat)
    loaders = trainer.get_dataloaders()
    train_loader = loaders[0]
    if cache == "device":
        from nps_tpu.data.pipeline import DeviceCacheLoader

        train_loader = DeviceCacheLoader(dataset.train, BATCH, seed=0)
    trainer.ensure_initialized(train_loader)

    # warm-up epochs pay the compiles: the random per-batch depth (0 or 1
    # at this ramp level) times the batch-size variants (a partial last
    # batch adds one) = up to 4 jit keys; two warm-up epochs make a cold
    # compile inside the timed window very unlikely, and the partial-batch
    # variants compile on their single fixed position in the epoch
    trainer.train_one_epoch(train_loader, 1)
    trainer.train_one_epoch(train_loader, 1)
    # count samples actually trained (drop_last=False keeps the partial
    # last batch; BATCH * len(loader) would overstate by up to 20%)
    n = sum(min(BATCH, len(dataset.train) - i * BATCH)
            for i in range(len(train_loader)))
    t0 = time.perf_counter()
    for e in range(epochs):
        trainer.train_one_epoch(train_loader, 1 + e)
    dt = time.perf_counter() - t0
    rate = epochs * n / dt
    label = f"cache={cache}" if cache else "host pipeline"
    label += ", remat" if remat else ""
    print(f"end-to-end epoch ({label}): {rate:.2f} samples/s "
          f"({dt / epochs:.1f} s/epoch, {len(train_loader)} batches)")
    return rate


def main():
    host_only = "--host-only" in sys.argv
    remat = "--remat" in sys.argv
    cache = None
    n_sims, epochs = 48, 2
    for a in sys.argv[1:]:
        if a.startswith("--cache="):
            cache = a.split("=", 1)[1]
        elif a.startswith("--n-sims="):
            n_sims = int(a.split("=", 1)[1])
        elif a.startswith("--epochs="):
            epochs = int(a.split("=", 1)[1])
    dataset = make_dataset(n_sims)
    print(f"dataset: {n_sims} sims x [1, {T_RES}, {NX}, {NX}] "
          f"({n_sims * T_RES * NX * NX * 4 / 1e9:.2f} GB)")
    bench_host_loader(dataset)
    if not host_only:
        bench_epoch(dataset, epochs=epochs, cache=cache, remat=remat)


if __name__ == "__main__":
    main()
