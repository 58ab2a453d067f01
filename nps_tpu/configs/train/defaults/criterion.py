"""Criterion presets, selectable via ``--criterion=MSE_sum``."""

MSE_sum = dict(
    object="nn.MSELoss",
    reduction="sum",
)
