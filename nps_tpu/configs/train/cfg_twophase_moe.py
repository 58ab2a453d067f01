"""Mixture-of-Spectral-Experts FNO on twophase (beyond reference).

No upstream counterpart — the reference has no MoE model (SURVEY.md §2.6).
This config trains a conditioning-gated mixture of spectral experts
(``nps_tpu/models/moe_fno.py``): the gate reads the model-level
conditioning vector (injection rate / viscosity-style static parameters
plus any encoded BCs), so each expert can specialise to a flow regime.
Scale the expert axis across chips with ``--trainer.expert_parallel=K``
(K must divide n_experts; see ``nps_tpu/parallel/expert.py``).
"""

from nps_tpu.configs.parse_component import load_config_modules, compose_config
from nps_tpu.configs.train._twophase_shared import (
    make_base, make_dataset, make_trainer, make_wrapper)
from nps_tpu.models.activations import GELUTanh, Tanh

base_args, parser = make_base()

model = dict(
    make_wrapper(base_args, Tanh()),
    # TPU-native config: tanh-approx GELU (BASELINE.md "Activation probe")
    activation=GELUTanh(),
    processor="MoEFNO",
    n_experts=4,
    fno_modes=10,
    hidden_blocks=3,
    hidden_features=192,
    fno_kernel_size=1,
    fno_conv_mode="single",
    padding_mode="circular",
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
