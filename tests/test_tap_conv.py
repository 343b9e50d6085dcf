"""TS sphere-skip tap-conv parity (VERDICT r2 weak #1 / next-round #3).

`ops/grid_sample.st_tap_conv` (contiguous row gathers + static shift
enumeration from the row-offset tables) must reproduce the gather path
`conv_stride_k(st_grid_sample_3x3(z, grid), w)` — forward, the true weight
gradient, the straight-through 0.1-blockmean input gradient
(reference GridSamplerFuncNoGrad.backward, grid_generator.py:615-623), and
stay double-grad safe (R1/PPL).
"""
import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.geometry.sphere_conv import SphereSkipConv, _conv_stride_k
from spgan_tpu.geometry.sphere_grid import (sphere_offset_tables_batch,
                                            sphere_patch_grid_batch)
from spgan_tpu.infer.stitcher import build_close_loop_plan
from spgan_tpu.models.generator import Generator
from spgan_tpu.ops.grid_sample import st_grid_sample_3x3, st_tap_conv

CIN = COUT = 3


def _plan_and_g():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    return g, build_close_loop_plan(g, 128, 672), tp.partial


def _skip_sizes(g, plan):
    _, _, i2j = g.ts.plan()
    out_sizes = plan.geom.outfeat_sizes
    return [out_sizes[src - 2] for src in sorted(i2j)]


def _margin(tables):
    return max(6, int(np.abs(np.asarray(tables["sx"])).max()) + 1)


def _grid_path(z, grid, w, grid_groups=0):
    return _conv_stride_k(st_grid_sample_3x3(z, grid, grid_groups), w, 3)


def test_tap_conv_forward_matches_gather_path():
    g, plan, partial = _plan_and_g()
    rng = np.random.RandomState(0)
    # 6 distinct lattice positions (distinct rows => distinct row offsets)
    cp = plan.coords_partial(1, 0, 6, partial)
    w = jnp.asarray(rng.randn(3, 3, CIN, COUT).astype(np.float32)) * 0.3
    w9 = w.reshape(9, CIN, COUT)
    for s in _skip_sizes(g, plan):
        z = jnp.asarray(rng.randn(6, s, s, CIN).astype(np.float32))
        grid = sphere_patch_grid_batch(cp, s, s)
        tables = sphere_offset_tables_batch(cp, s, s)
        want = np.asarray(_grid_path(z, grid, w))
        got = np.asarray(st_tap_conv(z, tables, w9, margin=_margin(tables)))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_tap_conv_grouped_matches_per_sample():
    """groups=G: one table per lattice position shared by B//G samples —
    the engine's patch_chunk folding."""
    g, plan, partial = _plan_and_g()
    rng = np.random.RandomState(1)
    G, Bg = 4, 2
    s = _skip_sizes(g, plan)[-1]
    cp_g = plan.coords_partial(1, 0, G, partial)       # one per group
    cp_b = plan.coords_partial(Bg, 0, G, partial)      # expanded per sample
    z = jnp.asarray(rng.randn(G * Bg, s, s, CIN).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, CIN, COUT).astype(np.float32)) * 0.3
    w9 = w.reshape(9, CIN, COUT)

    tab_g = sphere_offset_tables_batch(cp_g, s, s)
    tab_b = sphere_offset_tables_batch(cp_b, s, s)
    m = _margin(tab_b)
    want = np.asarray(st_tap_conv(z, tab_b, w9, margin=m))
    got = np.asarray(st_tap_conv(z, tab_g, w9, margin=m, groups=G))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    # and the grouped grid path agrees too
    grid_g = sphere_patch_grid_batch(cp_g, s, s)
    ref = np.asarray(_grid_path(z, grid_g, w, grid_groups=G))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_st_tap_conv_gradients_match_gather_path():
    """d/dweight: true gradient through the primal tap values.
    d/dz: 0.1-blockmean straight-through composed with the conv adjoint
    == (0.1/9) * cot @ sum_t(w9[t]).T — both must equal the gather path's."""
    g, plan, partial = _plan_and_g()
    rng = np.random.RandomState(2)
    s = _skip_sizes(g, plan)[0]
    cp = plan.coords_partial(1, 2, 3, partial)
    z = jnp.asarray(rng.randn(3, s, s, CIN).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, CIN, COUT).astype(np.float32)) * 0.3
    grid = sphere_patch_grid_batch(cp, s, s)
    tables = sphere_offset_tables_batch(cp, s, s)
    m = _margin(tables)
    cot = jnp.asarray(rng.randn(3, s, s, COUT).astype(np.float32))

    def loss_grid(zz, ww):
        return jnp.vdot(_grid_path(zz, grid, ww), cot)

    def loss_tap(zz, ww):
        return jnp.vdot(
            st_tap_conv(zz, tables, ww.reshape(9, CIN, COUT), margin=m), cot)

    gz_ref, gw_ref = jax.grad(loss_grid, argnums=(0, 1))(z, w)
    gz, gw = jax.grad(loss_tap, argnums=(0, 1))(z, w)
    np.testing.assert_allclose(np.asarray(gz), np.asarray(gz_ref),
                               atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=2e-4, rtol=1e-4)
    # closed form for the ST input gradient
    wsum = np.asarray(w).reshape(9, CIN, COUT).sum(0)
    np.testing.assert_allclose(
        np.asarray(gz), (0.1 / 9.0) * np.asarray(cot) @ wsum.T,
        atol=3e-6, rtol=1e-5)


def test_st_tap_conv_double_grad():
    """R1/PPL require grad-of-grad through the skip convs; the stop_gradient
    algebra (not custom_vjp) must stay twice-differentiable."""
    g, plan, partial = _plan_and_g()
    rng = np.random.RandomState(3)
    s = _skip_sizes(g, plan)[0]
    cp = plan.coords_partial(1, 0, 2, partial)
    z = jnp.asarray(rng.randn(2, s, s, CIN).astype(np.float32))
    w9 = jnp.asarray(rng.randn(9, CIN, COUT).astype(np.float32)) * 0.3
    tables = sphere_offset_tables_batch(cp, s, s)
    m = _margin(tables)

    def inner(zz):
        return jnp.sum(st_tap_conv(zz, tables, w9, margin=m) ** 2)

    def outer(zz):
        gr = jax.grad(inner)(zz)
        return jnp.sum(gr ** 2)

    gg = jax.grad(outer)(z)
    assert np.isfinite(np.asarray(gg)).all()


def test_skip_conv_apply_tables_matches_grid():
    """SphereSkipConv.apply with tables= must equal the grid path (bias,
    scale, LeakyReLU included) — the exact call the engine makes."""
    g, plan, partial = _plan_and_g()
    rng = np.random.RandomState(4)
    conv = SphereSkipConv()
    params = conv.init(jax.random.PRNGKey(5))
    params = {"weight": params["weight"]
              + 0.2 * jnp.asarray(rng.randn(3, 3, 3, 3).astype(np.float32)),
              "bias": params["bias"]}
    for s in _skip_sizes(g, plan):
        cp = plan.coords_partial(1, 1, 4, partial)
        z = jnp.asarray(rng.randn(4, s, s, 3).astype(np.float32))
        grid = sphere_patch_grid_batch(cp, s, s)
        tables = sphere_offset_tables_batch(cp, s, s)
        want = np.asarray(conv.apply(params, z, cp, grid=grid))
        got = np.asarray(conv.apply(params, z, cp, tables=tables,
                                    margin=_margin(tables)))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_training_col_margin_bounds_all_training_crops():
    """The static worst-case margin (train/step.py's skip-table gate) must
    bound the integer column shifts of tables built from ANY training crop —
    an under-estimate would silently clip sx and change outputs vs the
    gather path."""
    from spgan_tpu.geometry.coords import CoordGrid
    from spgan_tpu.geometry.sphere_grid import training_col_margin
    from spgan_tpu.models.generator import TextureSynthesizer

    grid = CoordGrid()
    ts = TextureSynthesizer()
    sizes = ts.skip_sizes() + [grid.ss_spatial_size]  # skips + SS layers
    for s in sizes:
        m = training_col_margin(s, 3, grid.size_x, grid.size_y, 0.8)
        worst = 0
        for seed in range(64):
            _, _, cp = grid.sample_training(jax.random.PRNGKey(seed), 8)
            sx = np.asarray(sphere_offset_tables_batch(cp, s, s)["sx"])
            worst = max(worst, int(sx.max()) + 1, int(-sx.min()))
        assert worst <= m, (s, worst, m)
