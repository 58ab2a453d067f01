from nps_tpu.common.interfaces import D, M  # noqa: F401
from nps_tpu.common.graph import GridGraph  # noqa: F401
from nps_tpu.common.data_creator import DataCreator  # noqa: F401
