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


def cast_compute(x):
    """Cast an activation tensor to the configured compute dtype."""
    dt = _COMPUTE_DTYPE
    if dt is not None and x.dtype != dt:
        return x.astype(dt)
    return x
