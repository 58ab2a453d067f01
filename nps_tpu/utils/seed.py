"""Seeding. Parity: ``src/utils/set_seed.py``.

In JAX, determinism is structural (explicit PRNG keys); this seeds the
host-side RNGs (python/numpy, used by the data pipeline for shuffling) and
records the seed for deriving the root ``jax.random.PRNGKey``.
"""

import os
import random

import numpy as np

_GLOBAL_SEED = 0


def set_seed(seed=1234):
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed % (2 ** 32))


def get_seed():
    return _GLOBAL_SEED
