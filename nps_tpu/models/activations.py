"""Activation shims.

The reference's config files instantiate ``torch.nn.GELU()`` / ``Tanh()``
objects directly inside config dicts (``src/configs/train/cfg_twophase_ufno.py:3,54,71``).
To keep config files launching unchanged, this module provides callable
activation classes with the same names and a resolver that also accepts
*torch* activation instances (torch is CPU-only here and only used as a
naming shim — the returned callables are pure jax functions).

Numerics parity: torch ``GELU()`` defaults to the exact erf formulation, so
``GELU`` maps to ``jax.nn.gelu(..., approximate=False)``.
"""

import jax
import jax.numpy as jnp


class _Activation:
    """Base: a named, argument-carrying callable usable as a config value."""

    def __call__(self, x):
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}()"

    # config values get deep-copied / compared by the parser
    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items()))))

    def __deepcopy__(self, memo):
        return self

    @classmethod
    def _parse_override(cls, spec):
        """CLI-override hook for the config parser: resolve a string spec
        (e.g. ``--model.activation=gelu_tanh``) to an activation object."""
        return resolve_activation(spec)


class GELU(_Activation):
    """Exact-erf GELU — bit-matches torch's default (``torch.nn.GELU()``).

    On TPU the exact erf is VPU-transcendental-bound: in the headline U-FNO
    depth-1 train step it costs ~22% of the wall-clock (27.5 -> 35.2
    samples/s when swapped for ReLU, BASELINE.md "Activation probe").
    Prefer :class:`GELUTanh` for TPU production runs; keep this class where
    bit-parity with torch transplants matters (the parity suite does).
    """

    def __call__(self, x):
        from nps_tpu.models import config as model_config

        # the no-grad pushforward body opts into the tanh approximation
        # (rounding-level difference at bf16; its output is only the next
        # window's input — see models.config.fast_forward_active)
        if model_config.fast_forward_active():
            return jax.nn.gelu(x, approximate=True)
        return jax.nn.gelu(x, approximate=False)


class GELUTanh(_Activation):
    """Tanh-approximate GELU — JAX's own default (``jax.nn.gelu``).

    Within ~2 bf16 ulps of exact GELU over the active range (max abs diff
    0.0156 at |x|~2, exactly the bf16 quantum there; identical on 68% of a
    dense bf16 grid), i.e. at bf16 compute precision the approximation
    error is rounding-level. Measured on the shipped U-FNO depth-1 train
    step: 35.0 samples/s vs 27.5 exact (+27%) — the erf transcendental is
    VPU-bound on TPU while tanh has a fast hardware path. Select from
    configs as ``activation="gelu_tanh"``.
    """

    def __call__(self, x):
        return jax.nn.gelu(x, approximate=True)


class Tanh(_Activation):
    def __call__(self, x):
        return jnp.tanh(x)


class ReLU(_Activation):
    def __call__(self, x):
        return jax.nn.relu(x)


class SiLU(_Activation):
    def __call__(self, x):
        return jax.nn.silu(x)


class Identity(_Activation):
    def __call__(self, x):
        return x


class Swish(_Activation):
    """x * sigmoid(beta * x) (``src/models/common.py:8-17``)."""

    def __init__(self, beta=1):
        self.beta = beta

    def __call__(self, x):
        return x * jax.nn.sigmoid(self.beta * x)


_BY_NAME = {
    "gelu": GELU(),
    "gelu_tanh": GELUTanh(),
    "gelu_approx": GELUTanh(),
    "tanh": Tanh(),
    "relu": ReLU(),
    "silu": SiLU(),
    "swish": Swish(),
    "identity": Identity(),
    "none": Identity(),
}


def resolve_activation(act):
    """Normalize an activation spec (str / callable / torch module) to a jax fn."""
    if act is None:
        return Identity()
    if isinstance(act, _Activation):
        return act
    if isinstance(act, str):
        key = act.lower()
        if key not in _BY_NAME:
            raise ValueError(f"Unknown activation '{act}'")
        return _BY_NAME[key]
    # torch modules (configs may carry torch.nn.GELU() etc. for compatibility)
    tname = type(act).__name__
    mod = type(act).__module__
    if mod.startswith("torch"):
        if tname in ("GELU",):
            approx = getattr(act, "approximate", "none")
            return _BY_NAME["gelu"] if approx == "none" else _BY_NAME["gelu_tanh"]
        if tname in _BY_NAME_TORCH:
            return _BY_NAME[_BY_NAME_TORCH[tname]]
        raise ValueError(f"Unsupported torch activation {tname}")
    if callable(act):
        return act
    raise ValueError(f"Cannot resolve activation from {act!r}")


_BY_NAME_TORCH = {
    "Tanh": "tanh",
    "ReLU": "relu",
    "SiLU": "silu",
    "Identity": "identity",
}
