from nps_tpu.pde.base import PDE, PDE1D, PDE2D  # noqa: F401
