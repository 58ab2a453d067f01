"""Optimizer presets, selectable via ``--optimizer=Adam``."""

Adam = dict(
    object="optim.Adam",
    lr=1e-4,
)
