"""nps_tpu — a TPU-native (JAX/XLA/Pallas/pjit) neural-PDE-surrogate framework.

A from-scratch rebuild of the capability surface of
yoeripoels/neural-pde-surrogates (config-driven training of autoregressive
neural PDE surrogates with temporal bundling, pushforward training, physics
post-processing and full-trajectory rollout evaluation), designed TPU-first:

- functional core: pure ``step_fn(params, batch, key) -> (loss, aux)``
- ``lax.scan`` rollouts with donated carries instead of Python loops
- channels-last (NHWC) conv layouts feeding the MXU
- spectral convolutions as split real/imag batched matmuls (+ Pallas kernels)
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding (the layer the
  reference lacks entirely; see SURVEY.md §2.6)

Capability parity map (reference file -> nps_tpu module) is documented per
module in docstrings, citing /root/reference file:line.
"""

__version__ = "0.1.0"

from nps_tpu.common.interfaces import D, M  # noqa: F401
