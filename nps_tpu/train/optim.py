"""Optimizer / LR-scheduler registry.

Maps the reference's torch dotted names (``optim.Adam``,
``optim.lr_scheduler.MultiStepLR`` — ``configs/train/defaults/``) onto
optax. The learning rate is injected as a mutable hyperparameter
(``optax.inject_hyperparams``) so the host-side scheduler can update it
without retracing the jitted train step.

Torch semantics preserved: torch Adam defaults (b1=0.9, b2=0.999, eps=1e-8);
MultiStepLR multiplies lr by ``gamma`` each time its step counter crosses a
milestone — the trainer calls ``scheduler.step()`` every
``lr_step_interval`` epochs, exactly like ``trainers/base.py:504-506``.
"""

import numpy as np
import optax


def build_optimizer(object="optim.Adam", lr=1e-3, **kwargs):
    name = object.split(".")[-1].lower() if isinstance(object, str) else object
    kw = dict(kwargs)
    betas = kw.pop("betas", (0.9, 0.999))
    eps = kw.pop("eps", 1e-8)
    weight_decay = kw.pop("weight_decay", 0.0)
    if name == "adam":
        if weight_decay:
            opt = optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
                weight_decay=weight_decay)
        else:
            opt = optax.inject_hyperparams(optax.adam)(
                learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "adamw":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay or 0.01)
    elif name == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=kw.pop("momentum", 0.0))
    else:
        raise ValueError(f"Unknown optimizer '{object}'")
    return opt, float(lr)


class MultiStepLR:
    """Torch MultiStepLR replica operating on a host-side lr value."""

    def __init__(self, base_lr, milestones, gamma=0.1):
        self.base_lr = float(base_lr)
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = float(gamma)
        self.epoch = 0  # scheduler step counter (not training epochs)

    def step(self):
        self.epoch += 1

    @property
    def lr(self):
        n = int(np.searchsorted(self.milestones, self.epoch, side="right"))
        return self.base_lr * (self.gamma ** n)


class StepLR:
    def __init__(self, base_lr, step_size, gamma=0.1):
        self.base_lr = float(base_lr)
        self.step_size = int(step_size)
        self.gamma = float(gamma)
        self.epoch = 0

    def step(self):
        self.epoch += 1

    @property
    def lr(self):
        return self.base_lr * (self.gamma ** (self.epoch // self.step_size))


class ConstantLR:
    def __init__(self, base_lr):
        self.base_lr = float(base_lr)

    def step(self):
        pass

    @property
    def lr(self):
        return self.base_lr


def build_lr_scheduler(base_lr, object=None, **kwargs):
    if object is None:
        return ConstantLR(base_lr)
    name = object.split(".")[-1] if isinstance(object, str) else object
    if name == "MultiStepLR":
        return MultiStepLR(base_lr, kwargs["milestones"],
                           kwargs.get("gamma", 0.1))
    if name == "StepLR":
        return StepLR(base_lr, kwargs["step_size"], kwargs.get("gamma", 0.1))
    raise ValueError(f"Unknown lr scheduler '{object}'")


def set_learning_rate(opt_state, lr):
    """Return a new optax opt state with the injected learning rate updated
    (functional; safe with donated buffers). Recurses through wrapper
    states (e.g. ``optax.MultiSteps`` under ``trainer.grad_accum``)."""
    import jax.numpy as jnp

    if hasattr(opt_state, "inner_opt_state"):  # MultiStepsState et al.
        return opt_state._replace(
            inner_opt_state=set_learning_rate(opt_state.inner_opt_state, lr))
    new_hp = {**opt_state.hyperparams,
              "learning_rate": jnp.asarray(lr, jnp.float32)}
    return opt_state._replace(hyperparams=new_hp)
