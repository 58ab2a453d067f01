"""Trainer namespace (mirrors the reference's ``src/trainers``)."""

from nps_tpu.train.base import TrainInterface  # noqa: F401
from nps_tpu.train.pushforward import AutoregressivePushforwardTrainer  # noqa: F401
from nps_tpu.train.losses import build_criterion  # noqa: F401
from nps_tpu.train.optim import build_optimizer, build_lr_scheduler  # noqa: F401
