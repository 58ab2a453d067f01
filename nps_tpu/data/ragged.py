"""Ragged (variable-length) memmap storage.

The reference stores variable-length 1D simulations with mmap_ninja's
RaggedMmap (``src/data/memmap_dataset.py:8``). This is a dependency-free
equivalent with the same access pattern (index -> ndarray, zero-copy reads
from a flat memmap):

    <dir>/data.npy     flat concatenation of all elements (ravelled)
    <dir>/offsets.npy  [n+1] int64 start offsets into data
    <dir>/shapes.npy   [n, ndim] int64 per-element shapes
"""

import os

import numpy as np


class RaggedMemmap:
    def __init__(self, dirname):
        self.dirname = dirname
        self.data = np.lib.format.open_memmap(
            os.path.join(dirname, "data.npy"), mode="r")
        self.offsets = np.load(os.path.join(dirname, "offsets.npy"))
        self.shapes = np.load(os.path.join(dirname, "shapes.npy"))

    def __len__(self):
        return len(self.shapes)

    def __getitem__(self, idx):
        lo, hi = self.offsets[idx], self.offsets[idx + 1]
        return np.asarray(self.data[lo:hi]).reshape(self.shapes[idx])

    @staticmethod
    def save(dirname, arrays, dtype=np.float32):
        os.makedirs(dirname, exist_ok=True)
        arrays = [np.asarray(a, dtype=dtype) for a in arrays]
        ndim = arrays[0].ndim
        assert all(a.ndim == ndim for a in arrays)
        sizes = [a.size for a in arrays]
        offsets = np.zeros(len(arrays) + 1, np.int64)
        np.cumsum(sizes, out=offsets[1:])
        flat = np.lib.format.open_memmap(
            os.path.join(dirname, "data.npy"), mode="w+", dtype=dtype,
            shape=(int(offsets[-1]),))
        for a, lo in zip(arrays, offsets[:-1]):
            flat[lo:lo + a.size] = a.ravel()
        flat.flush()
        del flat
        np.save(os.path.join(dirname, "offsets.npy"), offsets)
        np.save(os.path.join(dirname, "shapes.npy"),
                np.array([a.shape for a in arrays], np.int64))
        return RaggedMemmap(dirname)
