from spgan_tpu.evalkit.inception import InceptionV3FID  # noqa: F401
from spgan_tpu.evalkit.fid import (  # noqa: F401
    FIDStats,
    compute_stats,
    frechet_distance,
    eval_fid,
)
from spgan_tpu.evalkit.is_score import inception_score  # noqa: F401
from spgan_tpu.evalkit.lpips import LPIPS  # noqa: F401
