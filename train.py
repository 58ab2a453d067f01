"""Repo-root training entry point.

Mirrors the reference launch command exactly
(``python -m train -C configs/train/cfg_twophase_ufno.py --group.key=v``):
registers the top-level ``configs`` alias so reference-style config paths
resolve, then delegates to :mod:`nps_tpu.train_cli`.
"""

import sys

import nps_tpu.configs

# top-level alias: `configs.train.cfg_*` -> `nps_tpu.configs.train.cfg_*`
sys.modules.setdefault("configs", nps_tpu.configs)

from nps_tpu.train_cli import cli  # noqa: E402

if __name__ == "__main__":
    cli()
