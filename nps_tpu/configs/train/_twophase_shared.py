"""Shared config groups for the twophase experiment family.

The four ``cfg_twophase_*`` configs (parity:
``src/configs/train/cfg_twophase_{drn,unet,ufno,ufno_fno}.py``) differ only
in their model dict; the base args, dataset and trainer groups are shared.
"""

from nps_tpu.configs.parse_component import parse_base
from nps_tpu.configs.train.defaults import base


def make_base():
    base_args_dict = {**base.default, **dict(
        base_resolution=(501, 96, 64),
        super_resolution=(501, 96, 64),
        experiment="twophase",
        time_window=25,
    )}
    return parse_base(base_args_dict)


def make_dataset(base_args):
    return dict(
        object="PDE2DDataset",
        base_path=base_args.data_path,
        experiment=base_args.experiment,
        split_file="split",
        data_format="memmap",
        data_file="snapshots",
        conditioning="conditioning",
        spatial_conditioning="spatial_conditioning",
        name="twophase",
        preprocess=False,
        c_filter=[6],
    )


def make_trainer(base_args):
    return dict(
        object="AutoregressivePushforwardTrainer",
        neighbors=3,
        time_window=base_args.time_window,
        base_resolution=base_args.base_resolution,
        super_resolution=base_args.super_resolution,
        device="cpu",
        batch_size=base_args.batch_size,
        nr_gt_steps=1,
        nw=0,
        num_epochs=10 * 50,
        lr_step_interval=25,
        unrolling=8,
        print_interval=4,
        test_interval=25,
        max_train_batches=float("inf"),
        max_test_batches=float("inf"),
        print_setting=dict(print_per_step=True),
        process_settings={},
        # TPU-native extensions (inert on the reference workloads):
        data_parallel=False,
        spatial_parallel=0,
        tensor_parallel=0,
        pipeline_parallel=0,
        pipeline_microbatches=0,
        expert_parallel=0,
        zero1=False,
        grad_accum=0,  # >1 -> optax.MultiSteps gradient accumulation
        # cheaper numerics inside the no-grad pushforward scan body only
        # (bf16 GN statistics, tanh GELU); see models/config.py
        pushforward_fast=False,
        # ONE compiled train step serves every pushforward depth (traced
        # fori_loop trip count) — kills the per-depth ramp compile tax;
        # False restores the static per-depth builder
        dynamic_unroll=True,
        # eval loaders' batch size (0 -> batch_size): eval has no optimizer
        # state resident, so one whole-split batch cuts per-eval dispatches
        # and the remainder-batch jit specialization
        eval_batch_size=0,
        # compile-ahead: overlap the unroll ramp's future train-step
        # compiles with training (static-unroll fallback only;
        # train/pushforward.py)
        precompile_ahead=True,
        device_cache=False,
        device_cache_scope=None,  # None/"all" -> all splits; "train"
        device_cache_dtype=None,  # e.g. "bfloat16": cast cached floats
        matmul_precision=None,
        compute_dtype=None,
        resume=False,
        checkpoint_interval=None,  # None -> test_interval
        # multi-host bring-up: "" off, "auto" (TPU pod), "host:port,N,i"
        distributed="",
        eval_only=False,
        load_model=None,
    )


def make_wrapper(base_args, activation_final):
    """The physics activation-wrapper settings shared by all four configs."""
    return dict(
        object="activation_wrapper",
        activation_final=activation_final,
        enforce_spatial_cond=True,
        spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static",
        max_pct_dif=1 / 25,
        model_class="EncProcDec",
        num_c=1,
        num_spatial_dims=2,
        time_window=base_args.time_window,
        data_structure="grid",
        processor_residual=False,
        encoder="enc_grid.ElementWise",
        decoder="dec_grid.TimeConvDense",
        dec_delta_mode="per_step",
    )
