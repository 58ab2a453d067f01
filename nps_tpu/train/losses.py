"""Criterion registry.

The reference instantiates torch criteria by dotted name
(``rgetattr(torch, "nn.MSELoss")(reduction="sum")`` — ``train.py:36``,
``configs/train/defaults/criterion.py``). This registry maps the same names
(and plain aliases) to pure jnp loss functions so config files run
unchanged.
"""

import jax.numpy as jnp


def mse(pred, target, reduction="sum"):
    d = (pred - target) ** 2
    if reduction == "sum":
        return jnp.sum(d)
    if reduction == "mean":
        return jnp.mean(d)
    if reduction == "none":
        return d
    raise ValueError(f"Unknown reduction {reduction}")


def l1(pred, target, reduction="sum"):
    d = jnp.abs(pred - target)
    if reduction == "sum":
        return jnp.sum(d)
    if reduction == "mean":
        return jnp.mean(d)
    if reduction == "none":
        return d
    raise ValueError(f"Unknown reduction {reduction}")


_REGISTRY = {
    "nn.MSELoss": mse,
    "MSELoss": mse,
    "mse": mse,
    "nn.L1Loss": l1,
    "L1Loss": l1,
    "l1": l1,
}


def build_criterion(object=None, reduction="mean", **kwargs):
    """Build a criterion callable from a config group
    (e.g. ``dict(object="nn.MSELoss", reduction="sum")``)."""
    if callable(object):
        return object
    if object not in _REGISTRY:
        raise ValueError(f"Unknown criterion '{object}'; "
                         f"known: {sorted(_REGISTRY)}")
    fn = _REGISTRY[object]
    return lambda pred, target: fn(pred, target, reduction=reduction)
