from sos_slam_tpu.utils.config import Settings, default_settings  # noqa: F401
