"""Test harness setup: force the CPU backend with 8 virtual devices.

The environment pins JAX_PLATFORMS=axon (a single real TPU over a network
tunnel); tests must run hermetically on CPU, and multi-device tests use the
standard --xla_force_host_platform_device_count trick (SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
