"""Convert ragged datasets between mmap_ninja and nps_tpu layouts.

The reference stores variable-length simulations as mmap_ninja RaggedMmap
directories (``src/data/memmap_dataset.py:7,29-40``); nps_tpu reads those
directly (``nps_tpu/data/ragged.py``), but converting once to the native
layout removes the per-read metadata indirection.

Usage:
    python tools/convert_ragged.py <src_dir> <dst_dir>

Auto-detects the source layout; the copy streams element-by-element (never
materializes the whole dataset).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nps_tpu.data.ragged import open_ragged  # noqa: E402


def convert(src_dir, dst_dir):
    reader = open_ragged(src_dir)
    n = len(reader)
    sizes = np.zeros(n, np.int64)
    shapes = []
    for i in range(n):
        el = reader[i]
        shapes.append(el.shape)
        sizes[i] = el.size
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    dtype = reader[0].dtype if n else np.float32
    os.makedirs(dst_dir, exist_ok=True)
    flat = np.lib.format.open_memmap(
        os.path.join(dst_dir, "data.npy"), mode="w+", dtype=dtype,
        shape=(int(offsets[-1]),))
    for i in range(n):
        flat[offsets[i]:offsets[i + 1]] = np.asarray(reader[i]).ravel()
    flat.flush()
    del flat
    np.save(os.path.join(dst_dir, "offsets.npy"), offsets)
    ndim = len(shapes[0]) if n else 1
    assert all(len(s) == ndim for s in shapes), \
        "nps_tpu ragged layout requires uniform ndim"
    np.save(os.path.join(dst_dir, "shapes.npy"), np.array(shapes, np.int64))
    return n


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    n = convert(sys.argv[1], sys.argv[2])
    print(f"converted {n} elements: {sys.argv[1]} -> {sys.argv[2]}")


if __name__ == "__main__":
    main()
