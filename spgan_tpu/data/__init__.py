from spgan_tpu.data.pipeline import (  # noqa: F401
    PatchCropper,
    TrainPipeline,
    make_data_source,
    make_train_pipeline,
)
from spgan_tpu.data.pano import cubemap_to_equirect  # noqa: F401
