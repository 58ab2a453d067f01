"""Base-args preset (parity: ``configs/train/defaults/base.py``)."""

import os

default = dict(
    seed=42,
    time_window=25,
    batch_size=16,
    use_wandb=False,
    wandb_kwargs=dict(project="test-project", entity="neural-pde-surrogates"),
    num_c=1,
    data_path=os.environ.get("DATAROOT", "data"),
    function_pre=None,
    function_post=None,
    experiment_path="experiments",
    experiment_name=None,
)
