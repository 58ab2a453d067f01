from nps_tpu.pde.base import PDE, PDE1D, PDE2D, PDE3D  # noqa: F401
