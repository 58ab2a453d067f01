from nps_tpu.utils.attr import rgetattr, rsetattr, getattr_nested  # noqa: F401
from nps_tpu.utils.seed import set_seed  # noqa: F401
from nps_tpu.utils.misc import (  # noqa: F401
    Logger, dict_str, to_float, to_floatdict, to_floatlist, get_batch_size,
    random_timestr, count_parameters, get_graph_from_batch,
    grid_graph_to_array,
)
from nps_tpu.utils.isclose_iter import isclose_iter  # noqa: F401
from nps_tpu.utils.io import load_yaml, load_memmap  # noqa: F401
from nps_tpu.utils.broadcast import broadcast_to_grid  # noqa: F401
from nps_tpu.utils.slice_batch import index_batch, handle_item  # noqa: F401
from nps_tpu.utils.running_stats import RunningStats  # noqa: F401
