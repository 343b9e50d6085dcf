from spgan_tpu.infer.managers import InfiniteGenerationManager  # noqa: F401
