"""Data pipeline tests: projection geometry, crop/ac parity, batch shapes."""
import numpy as np

from spgan_tpu.config import Config
from spgan_tpu.data.pano import cubemap_to_equirect, FACES
from spgan_tpu.data.pipeline import (PatchCropper, TrainPipeline,
                                     center_square_resize)


def test_cubemap_to_equirect_shapes_and_continuity():
    rng = np.random.RandomState(0)
    faces = {k: np.full((64, 64, 3), i * 40, np.uint8)
             for i, k in enumerate(FACES)}
    pano = cubemap_to_equirect(faces, width=256, height=128,
                               edge_cutoff_ratio=0.6667)
    assert pano.shape == (85, 256, 3)  # round(128*0.6667)
    # equator row must traverse all 4 side faces
    mid = pano[pano.shape[0] // 2, :, 0]
    assert len(np.unique(mid)) >= 4


def test_center_square_resize():
    img = np.zeros((256, 768, 3), np.uint8)
    img[:, 256:512] = 255  # center third
    out = center_square_resize(img, 197)
    assert out.shape == (197, 197, 3)
    assert out.mean() > 200  # kept the center crop


def test_patch_cropper_ac_range():
    rng = np.random.RandomState(0)
    cropper = PatchCropper(197, 101, 3)
    img = rng.rand(197, 197, 3).astype(np.float32)
    acs = []
    for _ in range(200):
        patch, ac = cropper(img, rng)
        assert patch.shape == (101, 101, 3)
        acs.append(ac)
    acs = np.stack(acs)
    # reference denominators (input-patch-1) let the raw coord slightly
    # exceed 1 at the extreme crop (dataset.py:196)
    assert acs[:, 0].min() >= -1.0 and acs[:, 0].max() <= 1.03
    assert (np.abs(acs[:, 1:]) <= 1.0 + 1e-6).all()


def test_train_pipeline_batches():
    cfg = Config()
    cfg.train_params.batch_size = 4
    pipe = TrainPipeline(cfg, seed=0)
    try:
        b = next(pipe)
        assert b["patch"].shape == (4, 101, 101, 3)
        assert b["ac_coords"].shape == (4, 3)
        assert b["patch"].min() >= -1.0 and b["patch"].max() <= 1.0
        b2 = next(pipe)
        assert not np.array_equal(b["patch"], b2["patch"])
    finally:
        pipe.close()
