"""LR-scheduler presets, selectable via ``--lr_scheduler=MultiStepLR``."""

MultiStepLR = dict(
    object="optim.lr_scheduler.MultiStepLR",
    milestones=[1, 5, 10, 15],
    gamma=0.4,
)
