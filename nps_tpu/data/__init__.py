"""Data namespace (mirrors the reference's ``src/data``)."""

from nps_tpu.data.base import DatasetInterface  # noqa: F401
from nps_tpu.data.memmap_dataset import MemMapDataset  # noqa: F401
from nps_tpu.data.pde2d import PDE2DDataset  # noqa: F401
from nps_tpu.data.pde1d_var_t import PDE1DVarTDataset  # noqa: F401
from nps_tpu.data import transforms  # noqa: F401
