"""Activation shims: resolution and the GELUTanh numeric-proximity claim.

GELU (exact erf) mirrors torch's default (``torch.nn.GELU()``,
``src/configs/train/cfg_twophase_ufno.py:3``); GELUTanh is the TPU-fast
variant whose divergence from exact must stay at bf16 rounding level — the
bound BASELINE.md's "Activation probe" relies on.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nps_tpu.models.activations import (
    GELU, GELUTanh, Identity, ReLU, resolve_activation)


def test_resolve_strings():
    assert isinstance(resolve_activation("gelu"), GELU)
    assert isinstance(resolve_activation("gelu_tanh"), GELUTanh)
    assert isinstance(resolve_activation("gelu_approx"), GELUTanh)
    assert isinstance(resolve_activation("relu"), ReLU)
    assert isinstance(resolve_activation(None), Identity)
    with pytest.raises(ValueError):
        resolve_activation("gelu_typo")


def test_resolve_torch_gelu_variants():
    torch = pytest.importorskip("torch")
    assert isinstance(resolve_activation(torch.nn.GELU()), GELU)
    assert isinstance(
        resolve_activation(torch.nn.GELU(approximate="tanh")), GELUTanh)


def test_gelu_exact_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-12, 12, 4097, dtype=np.float32)
    ours = np.asarray(GELU()(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-6)


def test_gelu_tanh_within_bf16_rounding_of_exact():
    # dense grid over the active range, quantized to bf16 like production
    # inputs; the tanh approximation must stay within ~2 bf16 ulps
    x = jnp.asarray(np.linspace(-20, 20, 200_001, dtype=np.float32))
    xb = x.astype(jnp.bfloat16)
    exact = np.asarray(GELU()(xb).astype(jnp.bfloat16), dtype=np.float32)
    tanh = np.asarray(GELUTanh()(xb).astype(jnp.bfloat16), dtype=np.float32)
    # bf16 ulp at magnitude m is ~m * 2^-8; use max(|exact|, 1) as the scale
    # so the deep negative tail (both outputs ~0, abs diff ~1e-8) passes on
    # the absolute term
    scale = np.maximum(np.abs(exact), 1.0)
    ulps = np.abs(tanh - exact) / (scale * 2.0 ** -8)
    assert float(ulps.max()) <= 2.0, float(ulps.max())
    # and they agree exactly on most of the grid
    assert float((tanh == exact).mean()) > 0.6
