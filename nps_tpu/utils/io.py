"""Host-side IO helpers: yaml sidecars and numpy memmaps.

Parity: ``src/utils/load_yaml.py`` and ``src/utils/load_memmap.py``. The
reference additionally supports mmap_ninja RaggedMmap for variable-length 1D
data; that format is gated here (ragged storage for ``D.sim1d_var_t`` uses a
plain npz-of-objects fallback since mmap_ninja is not a dependency of this
build).
"""

import os

import numpy as np
import yaml


def load_yaml(path):
    with open(path, "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def save_yaml(path, obj):
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def load_memmap(data_format, data_dir, load_name):
    """Open a dataset file read-only without loading it into RAM."""
    if data_format == "memmap":
        return np.lib.format.open_memmap(
            os.path.join(data_dir, load_name + ".npy"), mode="r")
    if data_format == "raggedmemmap":
        from nps_tpu.data.ragged import RaggedMemmap

        return RaggedMemmap(os.path.join(data_dir, load_name))
    raise ValueError(f"data format {data_format} not supported")
