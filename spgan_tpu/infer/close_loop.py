from spgan_tpu.infer.managers import CloseLoopPanoramaManager  # noqa: F401
