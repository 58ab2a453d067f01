from nps_tpu.compat.torch_weights import (  # noqa: F401
    convert_state_dict, load_torch_checkpoint)
