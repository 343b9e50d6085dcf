"""Lattice-plan invariants + the closed-loop seam property.

The load-bearing integration test: wrap columns (j >= num_steps_w_min) read
exactly the same latent/noise/coordinate windows as their base columns
(j - num_steps_w_min), so their patches must be bit-identical — this is what
makes the 360-degree panorama seamless.
"""
import numpy as np
import pytest
import jax

from spgan_tpu.config import Config
from spgan_tpu.infer.engine import PanoramaEngine
from spgan_tpu.infer.stitcher import build_close_loop_plan, build_infinite_plan
from spgan_tpu.models.generator import Generator


def full_size_plan():
    cfg = Config()  # shipped config, no params needed for the plan
    g = Generator.from_config(cfg)
    return build_close_loop_plan(g, 384, 768)


def test_close_loop_plan_shipped_numbers():
    """Reference canonical task: 384x768 close-loop pano => 6x10 lattice,
    meta 581x768, z field 65x48 (close_loop_infinite_generation.py:428-460)."""
    plan = full_size_plan()
    assert plan.geom.pixelspace_step == 96
    assert plan.geom.latentspace_step == 6
    assert (plan.num_steps_h, plan.num_steps_w) == (6, 10)
    assert plan.num_steps_w_min == 8
    assert (plan.meta_h, plan.meta_w) == (581, 768)
    assert plan.window == 35
    assert (plan.z_field_h, plan.z_field_w) == (65, 48)
    assert plan.num_patches == 60
    # noise fields: outstep*(nh-1)+outsize x outstep*nw_min
    assert plan.noise_sizes[0] == (12 * 5 + 19, 12 * 8)
    assert plan.noise_sizes[-1] == (96 * 5 + 101, 96 * 8)
    # wrap-column cp equals base-column cp
    cps = plan.cp_scalars.reshape(6, 10, 5)
    np.testing.assert_allclose(cps[:, 8], cps[:, 0])
    np.testing.assert_allclose(cps[:, 9], cps[:, 1])


def test_infinite_plan_numbers():
    cfg = Config()
    g = Generator.from_config(cfg)
    plan = build_infinite_plan(g, 256, 512)
    # reference formula: ceil((target-101)/96) + 3
    assert plan.num_steps_h == int(np.ceil((256 - 101) / 96)) + 3
    assert plan.num_steps_w == int(np.ceil((512 - 101) / 96)) + 3
    assert plan.meta_h == 96 * (plan.num_steps_h - 1) + 101


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))
    plan = build_close_loop_plan(g, 128, 672)
    eng = PanoramaEngine(g=g, plan=plan, batch=2, patch_chunk=4,
                         grid_partial=tp.partial)
    return g, params, eng


def test_close_loop_wrap_columns_bit_identical(tiny_engine):
    g, params, eng = tiny_engine
    plan = eng.plan
    assert plan.num_steps_w_min == 7 and plan.num_steps_w == 9
    gl, z_field, noises = eng.sample_fields(jax.random.PRNGKey(3))
    patches = np.asarray(eng._generate_patches(params, gl, z_field, noises))
    P = plan.num_patches
    patches = patches.reshape(plan.num_steps_h, plan.num_steps_w,
                              *patches.shape[1:])
    # wrap cols 7,8 == base cols 0,1 (identical windows + cp). Note: this
    # holds only while the base column's own window does not wrap — the
    # reference circular-flag algorithm (close_loop:462-472) assigns
    # circular=False to wrap columns, so a wrapping base column would get a
    # different sphere grid. Width >= (window+zx)/zx*px guarantees it; the
    # shipped 768 config satisfies it for both wrap columns.
    np.testing.assert_array_equal(patches[:, 7], patches[:, 0])
    np.testing.assert_array_equal(patches[:, 8], patches[:, 1])


def test_meta_assembly_and_determinism(tiny_engine):
    g, params, eng = tiny_engine
    meta1 = np.asarray(eng.generate(params, jax.random.PRNGKey(5)))
    meta2 = np.asarray(eng.generate(params, jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(meta1, meta2)
    assert meta1.shape == (2, eng.plan.meta_h, eng.plan.meta_w, 3)
    assert np.isfinite(meta1).all()
    out = np.asarray(eng.crop_to_target(meta1))
    assert out.shape == (2, 128, 672, 3)


def test_meta_wrap_region_matches_base_columns(tiny_engine):
    """Meta-image columns [0, overlap) are written last by the wrap columns;
    by the bit-identity above the seam region equals the base columns' own
    content => the pano is continuous across the 0/360 boundary."""
    g, params, eng = tiny_engine
    plan = eng.plan
    gl, z_field, noises = eng.sample_fields(jax.random.PRNGKey(7))
    patches = np.asarray(eng._generate_patches(params, gl, z_field, noises))
    meta = np.asarray(eng.generate_from_fields(params, gl, z_field, noises))
    patches = patches.reshape(plan.num_steps_h, plan.num_steps_w,
                              *patches.shape[1:])
    # last row's final wrap column (j=8) writes cols 768..869 % 672
    i = plan.num_steps_h - 1
    r = i * plan.geom.pixelspace_step
    p = patches[i, 8]  # j=8 -> cols 768..869 -> 96..197 (no split)
    np.testing.assert_array_equal(meta[:, r:r + 101, 96:197], p)


def test_infinite_engine_generation():
    """Planar (non-wrapping) engine path end-to-end."""
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))
    plan = build_infinite_plan(g, 128, 128)
    eng = PanoramaEngine(g=g, plan=plan, batch=1, patch_chunk=4,
                         grid_partial=tp.partial)
    meta = np.asarray(eng.generate(params, jax.random.PRNGKey(9)))
    assert meta.shape == (1, plan.meta_h, plan.meta_w, 3)
    assert np.isfinite(meta).all()
    out = np.asarray(eng.crop_to_target(meta))
    assert out.shape == (1, 128, 128, 3)
    # every pixel written (no zeros-left-behind from the scatter)
    assert (np.abs(meta) > 0).mean() > 0.999


def test_dedup_wrap_meta_bit_identical(tiny_engine):
    """Rendering only the base columns (dedup_wrap=True, the default) must
    produce the exact meta image of the full 9-column render: wrap columns
    are bit-identical re-renders, and every overwrite in the reference's
    row-major order writes values identical to what is already there."""
    g, params, eng0 = tiny_engine
    # chunk 6 divides both 42 rendered and 63 full positions: identical
    # folded-batch shapes => bit-identical per-patch math in both engines
    eng = PanoramaEngine(
        g=g, plan=eng0.plan, batch=2, patch_chunk=6,
        grid_partial=eng0.grid_partial)
    assert eng._wrap_cols_dedupable()
    assert len(eng._render_idx) == eng.plan.num_steps_h * 7
    eng_full = PanoramaEngine(
        g=g, plan=eng.plan, batch=2, patch_chunk=6,
        grid_partial=eng.grid_partial, dedup_wrap=False)
    assert len(eng_full._render_idx) == eng.plan.num_patches
    gl, z_field, noises = eng.sample_fields(jax.random.PRNGKey(11))
    meta_dedup = np.asarray(eng.generate_from_fields(params, gl, z_field, noises))
    meta_full = np.asarray(eng_full.generate_from_fields(params, gl, z_field,
                                                         noises))
    np.testing.assert_array_equal(meta_dedup, meta_full)
    # patch protocol surface unchanged: full lattice shape, wrap cols aliased
    patches = np.asarray(eng._generate_patches(params, gl, z_field, noises))
    assert patches.shape[0] == eng.plan.num_patches


def test_dedup_wrap_disabled_for_wrapping_base_columns():
    """A pano narrow enough that base column 0's window wraps (z_field_w <
    window) must fall back to the full render — the wrap column's cp differs
    (circular flag quirk) so dedup would change the output."""
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    plan = build_close_loop_plan(g, 128, 192)  # z_field_w = 12 < window 35
    eng = PanoramaEngine(g=g, plan=plan, batch=1, patch_chunk=4,
                         grid_partial=tp.partial)
    assert not eng._wrap_cols_dedupable()
    assert len(eng._render_idx) == plan.num_patches


def test_ss_noise_engine_semantics():
    """ss_disable_noise=False at inference: per-sample SS noise maps are
    appended to the engine fields (reference test-time NoiseInjection cache
    semantics — every patch gets the SAME per-sample map, models/ops.py:
    740-773), generation is deterministic per key, actually affected by the
    noise, and the wrap-column bit-identity is preserved."""
    import jax.numpy as jnp

    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_disable_noise = False
    g = Generator.from_config(cfg)
    assert not g.ss.disable_noise
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))
    # noise weights init to 0 — give them bite so the maps matter
    for blk in params["ss"]["blocks"]:
        blk["planar"]["noise"]["weight"] = jnp.asarray(1.0)
    plan = build_close_loop_plan(g, 128, 672)
    eng = PanoramaEngine(g=g, plan=plan, batch=2, patch_chunk=4,
                         grid_partial=tp.partial)

    gl, z_field, noises = eng.sample_fields(jax.random.PRNGKey(3))
    assert len(noises) == len(plan.noise_sizes) + g.ss.n_layers
    assert noises[-1].shape == (2, g.ss.noise_sizes(plan.window)[-1],
                                g.ss.noise_sizes(plan.window)[-1], 1)

    m1 = np.asarray(eng.generate_from_fields(params, gl, z_field, noises))
    m2 = np.asarray(eng.generate_from_fields(params, gl, z_field, noises))
    np.testing.assert_array_equal(m1, m2)

    # zeroing the SS maps changes the output (noise actually flows)
    noises_zero = list(noises[:len(plan.noise_sizes)]) + [
        jnp.zeros_like(n) for n in noises[len(plan.noise_sizes):]]
    m3 = np.asarray(eng.generate_from_fields(params, gl, z_field,
                                             noises_zero))
    assert np.abs(m1 - m3).max() > 1e-6

    # wrap columns still bit-identical (same ss map at every position)
    patches = np.asarray(eng._generate_patches(params, gl, z_field, noises))
    patches = patches.reshape(plan.num_steps_h, plan.num_steps_w,
                              *patches.shape[1:])
    np.testing.assert_array_equal(patches[:, 7], patches[:, 0])
