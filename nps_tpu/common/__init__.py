from nps_tpu.common.interfaces import D, M  # noqa: F401
