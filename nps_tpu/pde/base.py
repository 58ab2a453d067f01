"""PDE metadata objects.

Capability parity with ``src/pdes/base.py:4-52`` in the reference: plain
metadata holders carrying time discretisation (tmin/tmax/nt -> dt), domain
extent (L*), grid resolution (nx*) and derived spacings (dx*), the coordinate
grid ``x``, and the conditioning-signal dimensionalities. Arbitrary extra
kwargs become attributes (used e.g. by DIV1D-style PDEs for ``var_mean_sd`` /
``bc_mode``).

TPU-first notes: grids are **numpy** arrays (host-side metadata); they are
promoted to device arrays only when entering a jitted step, so the PDE object
itself stays a cheap, static, hashable-by-identity config value.
"""

import numpy as np


class PDE:
    """Generic PDE metadata template."""

    def __init__(self, tmin, tmax, nt, name, n_cond_static=0, n_cond_dynamic=0,
                 n_cond_spatial=0, **kwargs):
        self.tmin = float(tmin)
        self.tmax = float(tmax)
        self.nt = int(nt)
        self.name = name
        self.n_cond_static = int(n_cond_static)
        self.n_cond_dynamic = int(n_cond_dynamic)
        self.n_cond_spatial = int(n_cond_spatial)
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __repr__(self):
        return self.name


class PDE1D(PDE):
    def __init__(self, tmin, tmax, nt, L, nx, x, name, n_cond_static=0,
                 n_cond_dynamic=0, **kwargs):
        super().__init__(tmin, tmax, nt, name, n_cond_static, n_cond_dynamic, **kwargs)
        self.dt = (self.tmax - self.tmin) / (self.nt - 1)
        self.L = float(L)
        self.nx = int(nx)
        self.dx = self.L / (self.nx - 1)
        self.dxs = [self.dx]
        if x is None:
            x = np.linspace(0.0, self.L, self.nx, dtype=np.float32)
        self.x = np.asarray(x)

    @property
    def num_spatial_dims(self):
        return 1

    @property
    def spatial_shape(self):
        return (self.nx,)


class PDE2D(PDE):
    def __init__(self, tmin, tmax, nt, L1, L2, nx1, nx2, x, name, n_cond_static=0,
                 n_cond_dynamic=0, n_cond_spatial=0, **kwargs):
        super().__init__(tmin, tmax, nt, name, n_cond_static, n_cond_dynamic,
                         n_cond_spatial, **kwargs)
        self.L1 = float(L1)
        self.L2 = float(L2)
        self.L = [self.L1, self.L2]
        self.nx1 = int(nx1)
        self.nx2 = int(nx2)

        # NOTE: reference uses tmax/(nt-1) here (not (tmax-tmin)/(nt-1)); kept
        # for metric parity (src/pdes/base.py:43).
        self.dt = self.tmax / (self.nt - 1)
        self.dx1 = self.L1 / (self.nx1 - 1)
        self.dx2 = self.L2 / (self.nx2 - 1)
        self.dxs = [self.dx1, self.dx2]

        if x is None:
            g1 = np.linspace(0.0, self.L1, self.nx1, dtype=np.float32)
            g2 = np.linspace(0.0, self.L2, self.nx2, dtype=np.float32)
            x = np.stack(np.meshgrid(g1, g2, indexing="ij"), axis=-1)
        self.x = np.asarray(x)

    @property
    def num_spatial_dims(self):
        return 2

    @property
    def spatial_shape(self):
        return (self.nx1, self.nx2)


class PDE3D(PDE):
    """3D PDE metadata.

    The reference has no PDE3D class but its model stack is dimension-generic
    (``src/models/common.py:37-47`` dispatches Conv3d, ``proc_fno.py:291-376``
    implements SpectralConv3d); 3D runs there use the generic ``PDE`` base
    with ad-hoc kwargs. This class gives that capability a first-class
    metadata object, mirroring PDE2D's derived quantities.
    """

    def __init__(self, tmin, tmax, nt, L1, L2, L3, nx1, nx2, nx3, x, name,
                 n_cond_static=0, n_cond_dynamic=0, n_cond_spatial=0, **kwargs):
        super().__init__(tmin, tmax, nt, name, n_cond_static, n_cond_dynamic,
                         n_cond_spatial, **kwargs)
        self.L1, self.L2, self.L3 = float(L1), float(L2), float(L3)
        self.L = [self.L1, self.L2, self.L3]
        self.nx1, self.nx2, self.nx3 = int(nx1), int(nx2), int(nx3)

        # same dt convention as PDE2D (reference src/pdes/base.py:43)
        self.dt = self.tmax / (self.nt - 1)
        self.dx1 = self.L1 / (self.nx1 - 1)
        self.dx2 = self.L2 / (self.nx2 - 1)
        self.dx3 = self.L3 / (self.nx3 - 1)
        self.dxs = [self.dx1, self.dx2, self.dx3]

        if x is None:
            grids = [np.linspace(0.0, L, n, dtype=np.float32)
                     for L, n in zip(self.L, (self.nx1, self.nx2, self.nx3))]
            x = np.stack(np.meshgrid(*grids, indexing="ij"), axis=-1)
        self.x = np.asarray(x)

    @property
    def num_spatial_dims(self):
        return 3

    @property
    def spatial_shape(self):
        return (self.nx1, self.nx2, self.nx3)
