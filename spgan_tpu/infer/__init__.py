from spgan_tpu.infer.stitcher import LatticePlan, build_close_loop_plan, build_infinite_plan  # noqa: F401
from spgan_tpu.infer.close_loop import CloseLoopPanoramaManager  # noqa: F401
from spgan_tpu.infer.infinite import InfiniteGenerationManager  # noqa: F401
