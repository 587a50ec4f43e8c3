"""Framework exception types.

Equivalent of the reference's SLAMException
(/root/reference/include/StereoVisionSLAM/slamexception.h:11-25). The
functional core cannot throw (jitted programs return masked validity instead);
these are raised by the host-side layers: I/O, config, orchestration.
"""


class SlamError(Exception):
    """Base error for stereovision_slam_tpu (the SLAMException analogue)."""


class DatasetError(SlamError):
    """Missing calibration/images (dataset.cpp:33 throw sites)."""


class ConfigError(SlamError):
    """Malformed or missing configuration (config.cpp:15-35)."""


class CheckpointError(SlamError):
    """Incompatible or corrupt checkpoint."""
