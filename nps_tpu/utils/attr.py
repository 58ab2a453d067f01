"""Dotted attribute access — the config override engine.

Parity: ``src/utils/attr.py`` (rgetattr/rsetattr drive ``--group.key=v``
overrides; getattr_nested drives the model-name resolver).
"""

import functools


def rgetattr(obj, attr, *args):
    def _get(o, a):
        return getattr(o, a, *args)

    return functools.reduce(_get, [obj] + attr.split("."))


def rsetattr(obj, attr, val):
    pre, _, post = attr.rpartition(".")
    return setattr(rgetattr(obj, pre) if pre else obj, post, val)


def getattr_nested(obj, path):
    """Resolve a dotted path on obj; return False (not raise) on a miss."""
    try:
        return functools.reduce(getattr, path.split("."), obj)
    except AttributeError:
        return False
