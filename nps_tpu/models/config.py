"""Global model-compute configuration.

``compute_dtype`` selects the activation/compute dtype of the conv/matmul
path (parameters always stored float32, accumulation always float32):

- None / "float32": full f32 — required for reference-parity runs;
- "bfloat16": activations flow in bf16 (the standard TPU training recipe) —
  halves HBM traffic for the memory-bound elementwise/norm/concat ops and
  feeds the MXU its native input type. Normalization statistics and the
  physics wrapper stay in f32.

Set before tracing (it is read at trace time):
    import nps_tpu.models as models
    models.set_compute_dtype("bfloat16")
or via the trainer config key ``compute_dtype`` / CLI
``--trainer.compute_dtype=bfloat16``.
"""

import jax.numpy as jnp

_COMPUTE_DTYPE = None


def set_compute_dtype(dtype):
    global _COMPUTE_DTYPE
    if dtype in (None, "float32", "f32", jnp.float32):
        _COMPUTE_DTYPE = None
    elif dtype in ("bfloat16", "bf16", jnp.bfloat16):
        _COMPUTE_DTYPE = jnp.bfloat16
    else:
        raise ValueError(f"Unsupported compute dtype {dtype!r}")


def compute_dtype():
    return _COMPUTE_DTYPE


# GroupNorm statistics implementation: "reduce" (convert-to-f32 + fused
# multi-output VPU reduce — the default) or "mxu" (the same f32-accumulated
# statistics as dot_general contractions, which the MXU pipelines at HBM
# rate; candidate for the 156-217 GB/s stat-reduce term in BASELINE.md's
# post-tanh decomposition). Same semantics up to reduction order; A/B via
# tools/bench_gn_stats.py (micro) and NPS_GN_STATS=mxu python bench.py
# (full step). Read at trace time, like compute_dtype.
import os as _os

_GN_STATS_IMPL = _os.environ.get("NPS_GN_STATS", "reduce")


def set_gn_stats_impl(impl):
    global _GN_STATS_IMPL
    if impl not in ("reduce", "mxu"):
        raise ValueError(f"Unsupported GN stats impl {impl!r}")
    _GN_STATS_IMPL = impl


def gn_stats_impl():
    return _GN_STATS_IMPL


_FAST_FORWARD = False


def fast_forward_active():
    """Trace-time flag: the current model apply is a no-grad pushforward
    forward whose output only becomes the *input* of the next train window
    (never a gradient path), so modules may opt into cheaper numerics —
    bf16 GroupNorm statistics, tanh-approximate GELU. The pushforward trick
    trains on model-perturbed inputs by design, so stat-precision noise
    here is within the method's own noise injection
    (``trainers/autoregressivepushforwardtrainer.py:115-144``)."""
    return _FAST_FORWARD


class fast_forward_scope:
    """Enable ``fast_forward_active`` while tracing a region (the no-grad
    pushforward ``lax.scan`` body). Trace-time only, like compute_dtype."""

    def __init__(self, enabled=True):
        self.enabled = bool(enabled)

    def __enter__(self):
        global _FAST_FORWARD
        self.prev = _FAST_FORWARD
        _FAST_FORWARD = self.enabled
        return self

    def __exit__(self, *a):
        global _FAST_FORWARD
        _FAST_FORWARD = self.prev
        return False


def cast_compute(x):
    """Cast an activation tensor to the configured compute dtype."""
    dt = _COMPUTE_DTYPE
    if dt is not None and x.dtype != dt:
        return x.astype(dt)
    return x
