"""Config-module loading with injected globals.

Parity: ``src/configs/module_loader.py`` — a defaults module is executed
with ``base_args`` pre-set as a module global, and the resulting module is
wrapped so dict/Namespace attributes are copied on access (presets are
never mutated by consumers).
"""

import importlib
import importlib.util
from argparse import Namespace


class ModuleClass:
    def __init__(self, module):
        for name in dir(module):
            setattr(self, name, getattr(module, name))

    def __getattribute__(self, name):
        item = object.__getattribute__(self, name)
        if isinstance(item, dict):
            return dict(item)
        if isinstance(item, Namespace):
            return Namespace(**vars(item))
        return item


def load_module_safe(module_name, **inject):
    spec = importlib.util.find_spec(module_name)
    module = importlib.util.module_from_spec(spec)
    for key, value in inject.items():
        setattr(module, key, value)
    spec.loader.exec_module(module)
    return ModuleClass(module)
