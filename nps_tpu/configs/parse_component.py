"""Config composition helpers. Parity: ``src/configs/parse_component.py``.

``parse_base`` two-stage-parses the base args (so later groups can reference
them); ``compose_config`` registers the six canonical groups.
"""

import argparse

from nps_tpu.configs.parse import add_arguments, add_group, DEFAULTS_ROOTS
from nps_tpu.configs.module_loader import load_module_safe


def load_config_modules(base_args):
    modules = []
    for name in ["dataset", "optimizer", "lr_scheduler", "model", "criterion",
                 "trainer"]:
        module = None
        for root in DEFAULTS_ROOTS:
            try:
                module = load_module_safe(f"{root}.train.defaults.{name}",
                                          base_args=base_args)
                break
            except (ImportError, ModuleNotFoundError, ValueError):
                continue
        if module is None:
            raise ImportError(f"cannot locate defaults module '{name}'")
        modules.append(module)
    return modules


def parse_base(base_cfg):
    base_parser = argparse.ArgumentParser(add_help=False)
    add_arguments(base_parser, base_cfg)
    base_args, _ = base_parser.parse_known_args()
    parser = argparse.ArgumentParser(parents=[base_parser])
    return base_args, parser


def compose_config(parser, base_args, dataset, optimizer, lr_scheduler, model,
                   criterion, trainer):
    for name, cfg in [("dataset", dataset), ("optimizer", optimizer),
                      ("lr_scheduler", lr_scheduler), ("model", model),
                      ("criterion", criterion), ("trainer", trainer)]:
        add_group(parser, base_args, cfg, name)
