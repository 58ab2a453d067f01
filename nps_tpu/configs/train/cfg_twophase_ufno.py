"""U-FNO on twophase (parity: ``src/configs/train/cfg_twophase_ufno.py``)."""

from nps_tpu.configs.parse_component import load_config_modules, compose_config
from nps_tpu.configs.train._twophase_shared import (
    make_base, make_dataset, make_trainer, make_wrapper)
from nps_tpu.models.activations import GELU, Tanh

base_args, parser = make_base()

model = dict(
    make_wrapper(base_args, Tanh()),
    # exact-erf GELU mirrors the reference config values (torch default).
    # For TPU production, --model.activation=gelu_tanh is +25% step
    # throughput at rounding-level (~2 bf16 ulp) numeric difference —
    # BASELINE.md "Activation probe".
    activation=GELU(),
    processor="UFNO",
    fno_modes=10,
    hidden_blocks=3,
    hidden_features=192,
    fno_kernel_size=1,
    fno_conv_mode="single",
    padding_mode="circular",
    ch_mults=[1, 1],
    is_attn=[False for _ in range(2)],
    mid_attn=False,
    norm=True,
    use1x1=True,
)

_, optimizer, lr_scheduler, _, criterion, _ = load_config_modules(base_args)

compose_config(parser,
               base_args=base_args,
               dataset=make_dataset(base_args),
               optimizer=optimizer.Adam,
               lr_scheduler=lr_scheduler.MultiStepLR,
               model=model,
               criterion=criterion.MSE_sum,
               trainer=make_trainer(base_args))
