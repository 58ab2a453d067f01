from nps_tpu.ops.spectral import spectral_conv_nd  # noqa: F401
