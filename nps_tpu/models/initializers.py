"""Torch-matching parameter initializers.

The reference relies on PyTorch's default layer init (kaiming-uniform with
a=sqrt(5), which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias). Training-dynamics parity requires matching these
distributions, so conv/linear layers here use explicit initializers rather
than flax defaults (SURVEY.md §7 hard-part 2).
"""

import numpy as np
import jax


def conv_kernel_init(num_spatial_dims):
    """U(-b, b) with b = 1/sqrt(in_ch * prod(kernel)); kernel layout [*k, I, O]."""

    def init(key, shape, dtype):
        k_spatial = shape[:num_spatial_dims]
        fan_in = int(np.prod(k_spatial)) * shape[-2]
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv_transpose_kernel_init(num_spatial_dims):
    """Torch ConvTranspose fan_in = out_ch * prod(kernel) (weight [I, O, *k])."""

    def init(key, shape, dtype):
        k_spatial = shape[:num_spatial_dims]
        fan_in = int(np.prod(k_spatial)) * shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def fan_in_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def linear_kernel_init():
    """Torch Linear: kernel layout here is [in, out]; fan_in = in."""

    def init(key, shape, dtype):
        bound = 1.0 / np.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def spectral_weight_init(scale):
    """Complex spectral weights: real & imag each ~ scale * U[0, 1).

    Matches ``scale * torch.rand(..., dtype=torch.cfloat)`` which samples the
    real and imaginary parts independently from U[0, 1)
    (``src/models/enc_proc_dec_components/proc_fno.py:178-180``). Stored
    split as a leading axis of size 2 -> [2, i, o, *modes].
    """

    def init(key, shape, dtype):
        return scale * jax.random.uniform(key, shape, dtype, 0.0, 1.0)

    return init
