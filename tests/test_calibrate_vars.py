"""Calibration algebra + TestingVars round trips."""
import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.infer.calibrate import (calibrate_backward,
                                       calibrate_backward_ss,
                                       resize_align_corners)
from spgan_tpu.infer.stitcher import build_close_loop_plan
from spgan_tpu.infer.testing_vars import TestingVars
from spgan_tpu.models.generator import Generator
from spgan_tpu.ops.spatial import ConvSpec

TS101 = [ConvSpec(upsample=u) for u in
         [True, False, True, False, True, False, True, False]]


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    got = np.asarray(resize_align_corners(jnp.asarray(x), 13, 17))
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(13, 17), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_calibrate_backward_sizes():
    """image 101 -> z 11 through the TS chain (reverse of the out chain)."""
    x = jnp.zeros((1, 101, 101, 3))
    feats, pins = calibrate_backward(TS101, x, pin_loc=(50, 50))
    sizes = [f.shape[1] for f in feats]
    # reverse chain: 103, 53, 55, 29, 31, 17, 19, 11 (input sizes per layer)
    assert sizes == [103, 53, 55, 29, 31, 17, 19, 11]
    assert all(p is not None for p in pins)
    # center pixel stays (approximately) centered
    assert abs(pins[-1][0] - 5) <= 1 and abs(pins[-1][1] - 5) <= 1


def test_calibrate_backward_ss_sizes():
    x = jnp.zeros((1, 11, 11, 8))
    feats, pins = calibrate_backward_ss(4, 3, x, pin_loc=(5, 5))
    assert feats[-1].shape[1] == 35  # back to the SS input size
    assert pins[-1] == (17, 17)


def test_testing_vars_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tv = TestingVars(
        meta_img=rng.randn(1, 32, 48, 3).astype(np.float32),
        global_latent=rng.randn(1, 2, 16).astype(np.float32),
        local_latent=rng.randn(1, 20, 24, 8).astype(np.float32),
        meta_coords=rng.randn(20, 24, 3).astype(np.float32),
        noises=[rng.randn(1, 10, 12, 1).astype(np.float32)])
    p = str(tmp_path / "vars.npz")
    tv.save(p)
    tv2 = TestingVars.load(p)
    np.testing.assert_array_equal(tv.local_latent, tv2.local_latent)
    np.testing.assert_array_equal(tv.noises[0], tv2.noises[0])


def test_testing_vars_masked_update():
    rng = np.random.RandomState(0)
    tv = TestingVars(meta_img=None,
                     global_latent=rng.randn(1, 2, 4).astype(np.float32),
                     local_latent=np.zeros((1, 4, 4, 2), np.float32),
                     meta_coords=np.zeros((4, 4, 3), np.float32),
                     noises=[np.zeros((1, 4, 4, 1), np.float32)])
    sel = np.zeros((4, 4))
    sel[1:3, 1:3] = 1
    tv.update_local_latent(np.ones((1, 4, 4, 2), np.float32), sel)
    assert tv.local_latent[0, 1, 1, 0] == 1 and tv.local_latent[0, 0, 0, 0] == 0


def test_replace_by_records_paste():
    cfg = Config()
    g = Generator.from_config(cfg)
    plan = build_close_loop_plan(g, 384, 768)
    rng = np.random.RandomState(0)
    tv = TestingVars(
        meta_img=None,
        global_latent=rng.randn(1, 2, 8).astype(np.float32),
        local_latent=np.zeros((1, plan.z_field_h, plan.z_field_w, 4),
                              np.float32),
        meta_coords=np.zeros((plan.z_field_h, plan.z_field_w, 3), np.float32),
        noises=[np.zeros((1, h, w, 1), np.float32)
                for (h, w) in plan.noise_sizes])
    rec = {"local_latent": np.ones((11, 11, 4), np.float32),
           "noises": [np.ones((s, s, 1), np.float32)
                      for s in plan.geom.outfeat_sizes]}
    tv.replace_by_records(plan, [rec], [0.0])  # placement at the seam (wraps)
    assert tv.local_latent.sum() == 11 * 11 * 4
    # wrap-aware: columns pasted across the seam
    assert tv.local_latent[0, :, 0].sum() > 0
    assert tv.local_latent[0, :, -1].sum() > 0
