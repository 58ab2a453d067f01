"""Stretch config: 2D Navier-Stokes-scale turbulence at 512^2, data-parallel
U-FNO (BASELINE.json configs list: "new: 2D Navier-Stokes turbulence at
512^2, data-parallel U-FNO across a v5p-16").

Beyond the reference's workloads: batch sharded over the full device mesh
('data' axis), bf16 activations, per-block rematerialization. Generate a
synthetic dataset at this shape with:

    python -m nps_tpu.data.synthetic --out $DATAROOT/ns512 \
        --n-sims 64 --n-channels 1 --nt 101 --nx1 512 --nx2 512

Spatial-domain sharding: set ``--trainer.spatial_parallel=K`` to shard the
first spatial dimension over K mesh columns (a ("data", "x") grid mesh);
XLA GSPMD inserts the halo exchanges and spectral/norm psums through the
unchanged model (equivalence proven in tests/test_spatial_model.py). With
the default ``data_parallel=True`` the batch alone is sharded.
"""

from nps_tpu.configs.parse_component import load_config_modules, compose_config
from nps_tpu.configs.parse import parse_arg_default  # noqa: F401 (flag types)
from nps_tpu.configs.train.defaults import base
from nps_tpu.configs.parse_component import parse_base
from nps_tpu.models.activations import GELUTanh, Tanh

base_args_dict = {**base.default, **dict(
    base_resolution=(101, 512, 512),
    super_resolution=(101, 512, 512),
    experiment="ns512",
    time_window=25,
    batch_size=8,
)}
base_args, parser = parse_base(base_args_dict)

dataset = dict(
    object="PDE2DDataset",
    base_path=base_args.data_path,
    experiment=base_args.experiment,
    split_file="split",
    data_format="memmap",
    data_file="snapshots",
    conditioning="conditioning",
    spatial_conditioning="spatial_conditioning",
    name="ns512",
    preprocess=False,
    c_filter=[0],
)

trainer = dict(
    object="AutoregressivePushforwardTrainer",
    neighbors=3,
    time_window=base_args.time_window,
    base_resolution=base_args.base_resolution,
    super_resolution=base_args.super_resolution,
    device="tpu",
    batch_size=base_args.batch_size,
    nr_gt_steps=1,
    nw=0,
    num_epochs=500,
    lr_step_interval=25,
    unrolling=4,
    print_interval=4,
    test_interval=25,
    max_train_batches=float("inf"),
    max_test_batches=float("inf"),
    print_setting=dict(print_per_step=False),
    process_settings={},
    # Pure DP at batch 2/chip is the measured-best 8-chip layout at 512^2
    # (AOT memory fits, tools/bench_ns512_layouts.py): dp8 batch16 fits at
    # 11.0 GiB temps/chip; dp2xsp4 also fits (12.6 GiB) but adds halo
    # traffic with no memory need at this grid — reserve spatial_parallel
    # for grids where per-chip batch 1 no longer fits; dp4xtp2 and dp8
    # batch24 (3/chip) both OOM by ~210 MB. See BASELINE.md "ns512 layouts".
    data_parallel=True,
    spatial_parallel=0,  # set K>1 for the ("data", "x") grid mesh
    dynamic_unroll=True,  # one compiled step for every unroll depth
    # 512^2 input tax: the 52-sim train split is 5.5 GB f32 — a bf16
    # train-only cache (2.75 GB HBM) kills the ~212 MB/batch H2D copy
    # while eval stays on the f32 host path for exact metrics
    device_cache=False,
    device_cache_scope="train",
    device_cache_dtype="bfloat16",
    eval_batch_size=0,  # 0 -> batch_size; eval has no opt state resident
    matmul_precision=None,
    compute_dtype="bfloat16",
    resume=True,
    checkpoint_interval=None,  # None -> test_interval
    eval_only=False,
    load_model=None,
)

model = dict(
    object="activation_wrapper",
    activation_final=Tanh(),
    enforce_spatial_cond=False,
    spatial_cond_channel=0,
    approx_volume_preserve=False,
    approx_volume_preserve_mode="individual_static",
    max_pct_dif=1 / 25,
    model_class="EncProcDec",
    num_c=1,
    num_spatial_dims=2,
    time_window=base_args.time_window,
    data_structure="grid",
    processor_residual=False,
    encoder="enc_grid.ElementWise",
    # TPU-only stretch config (no reference mirror): tanh-approx
    # GELU, +25% step throughput at ~2 bf16 ulp numeric cost
    # (BASELINE.md "Roofline + activation probe")
    activation=GELUTanh(),
    processor="UFNO",
    fno_modes=20,
    hidden_blocks=3,
    hidden_features=128,
    fno_kernel_size=1,
    fno_conv_mode="single",
    padding_mode="circular",
    ch_mults=[1, 1, 1],
    is_attn=[False for _ in range(3)],
    mid_attn=False,
    norm=True,
    use1x1=True,
    remat=True,
    remat_policy="save_conv_outputs",  # fastest rematting mode (keeps
    # conv results, recomputes only elementwise/norm/concat work)
    decoder="dec_grid.TimeConvDense",
    dec_delta_mode="per_step",
)

_, optimizer, lr_scheduler, _, criterion, _ = load_config_modules(base_args)

compose_config(parser,
               base_args=base_args,
               dataset=dataset,
               optimizer=optimizer.Adam,
               lr_scheduler=lr_scheduler.MultiStepLR,
               model=model,
               criterion=criterion.MSE_sum,
               trainer=trainer)
