"""Model namespace (mirrors the reference's ``src/models``)."""

from nps_tpu.models import common  # noqa: F401
from nps_tpu.models import activations  # noqa: F401
from nps_tpu.models.activations import (  # noqa: F401
    GELU, Tanh, ReLU, SiLU, Swish, Identity, resolve_activation)
from nps_tpu.models.enc_proc_dec import (  # noqa: F401
    EncProcDec as EncProcDecModule, build_enc_proc_dec, create_model)
from nps_tpu.models.activation_wrapper import (  # noqa: F401
    ActivationWrapper, activation_wrapper)
from nps_tpu.models import enc_proc_dec_components  # noqa: F401

# string-resolvable names (reference: getattr(models, "EncProcDec"))
EncProcDec = build_enc_proc_dec
