"""Component registry namespace (mirrors the reference's
``models/enc_proc_dec_components``): encoders, processors, decoders
addressable by string from configs (e.g. ``"enc_grid.ElementWise"``,
``"UFNO"``, ``"dec_grid.TimeConvDense"``)."""

from nps_tpu.models import enc_grid, dec_grid, gnn  # noqa: F401
from nps_tpu.models.fno import FNO, FNO_Layer, SpectralConvND  # noqa: F401
from nps_tpu.models.gnn import MPGNN  # noqa: F401
from nps_tpu.models.ufno import UFNO  # noqa: F401
from nps_tpu.models.moe_fno import MoEFNO  # noqa: F401
from nps_tpu.models.unet_modern import UNetModern  # noqa: F401
from nps_tpu.models.dilated_resnet import DilatedResnet  # noqa: F401
