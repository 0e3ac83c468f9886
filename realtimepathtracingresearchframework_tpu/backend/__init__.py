from realtimepathtracingresearchframework_tpu.backend import params  # noqa: F401
