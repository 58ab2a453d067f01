"""The 2D snapshot dataset (twophase flow).

Capability parity with ``src/data/PDE2D.py``: wraps MemMapDataset with an
optional channel filter (``c_filter``, e.g. [6] = saturation channel),
splits via a ``split.yaml`` index file or fractional fallback, and derives
the PDE2D metadata (domain extents from the grid, nt from tmax/dt,
conditioning dims from element 0).
"""

import os

import numpy as np

from nps_tpu.common.interfaces import D
from nps_tpu.data.base import DatasetInterface, Subset
from nps_tpu.data.memmap_dataset import MemMapDataset
from nps_tpu.data import transforms
from nps_tpu.pde import PDE2D
from nps_tpu.utils.io import load_yaml


class PDE2DDataset(DatasetInterface):
    data_interface = D.sim2d

    def __init__(self, base_path, experiment, data_format, data_file,
                 conditioning=None, t_conditioning=None,
                 spatial_conditioning=None, c_filter=None, split_file=None,
                 split_val=0.05, split_test=0.05, name="PDE2D",
                 preprocess=False, preprocess_path=None):
        data_path = os.path.join(base_path, f"{experiment}")
        self.experiment = experiment

        if c_filter is not None:
            c_idx = np.array(c_filter)
            data_transform = lambda u: u[c_idx]  # noqa: E731
        else:
            data_transform = None

        self.dataset = MemMapDataset(
            data_path, data_file, data_format=data_format,
            conditioning=conditioning, t_conditioning=t_conditioning,
            spatial_conditioning=spatial_conditioning,
            data_transform=data_transform, grid_transform=None,
            preprocess=preprocess, preprocess_path=preprocess_path)

        if split_file is not None:
            if not split_file.lower().endswith(".yaml"):
                split_file = split_file + ".yaml"
            split = load_yaml(os.path.join(data_path, split_file))
            train_idx = np.array(split["train"])
            valid_idx = np.array(split["valid"])
            test_idx = np.array(split["test"])
        else:
            idx = np.arange(len(self.dataset))
            n_val = int(split_val * len(self.dataset))
            n_test = int(split_test * len(self.dataset))
            train_idx = idx[:-(n_val + n_test)]
            valid_idx = idx[-(n_val + n_test):-n_test]
            test_idx = idx[-n_test:]
            print(f"Warning: No data split provided. Using "
                  f"{(1 - split_val - split_test) * 100:.1f}%:"
                  f"{split_val * 100:.1f}%:{split_test * 100:.1f}% "
                  f"train:valid:test")

        self.train_dataset = Subset(self.dataset, train_idx)
        self.valid_dataset = Subset(self.dataset, valid_idx)
        self.test_dataset = Subset(self.dataset, test_idx)

        nt_in = int(self.dataset.tmax / self.dataset.dt) + 1
        nt_out = nt_in
        tmin, tmax = transforms.get_t_downsample(
            self.dataset.tmin, self.dataset.tmax, nt_in, ratio_nt=1)
        x = self.dataset.x
        nx1, nx2 = x.shape[:2]
        L1 = x[-1, 0, 0] - x[0, 0, 0]
        L2 = x[0, -1, 1] - x[0, 0, 1]

        _, _, _, cond, t_cond, spatial_cond = self.dataset[0]
        n_cond_static = cond.shape[0] if conditioning is not None else 0
        n_cond_dynamic = t_cond.shape[0] if t_conditioning is not None else 0
        n_cond_spatial = (spatial_cond.shape[0]
                          if spatial_conditioning is not None else 0)

        self._pde = PDE2D(tmin=tmin, tmax=tmax, nt=nt_out, L1=L1, L2=L2,
                          nx1=nx1, nx2=nx2, x=x, name=name,
                          n_cond_static=n_cond_static,
                          n_cond_dynamic=n_cond_dynamic,
                          n_cond_spatial=n_cond_spatial)

    @property
    def pde(self):
        return self._pde

    def __repr__(self):
        return f"{self.pde}_{self.experiment}"

    @property
    def train(self):
        return self.train_dataset

    @property
    def valid(self):
        return self.valid_dataset

    @property
    def test(self):
        return self.test_dataset
