"""Pallas fused sphere-conv kernel vs the XLA gather+conv reference path
(interpret mode on CPU; the same kernel compiles on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spgan_tpu.geometry.sphere_grid import (sphere_offset_tables,
                                            sphere_patch_grid)
from spgan_tpu.ops.grid_sample import bilinear_grid_sample
from spgan_tpu.ops.pallas.sphere_kernel import fused_sphere_conv


def _conv_stride3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(3, 3), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("hw,circ", [(35, 0.0), (17, 1.0), (29, 0.0)])
def test_fused_kernel_matches_xla_path(hw, circ, dtype, rng):
    H = W = hw
    C, Cout, B = 16, 8, 2
    dt = jnp.dtype(dtype)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(dt)
    w = jnp.asarray(rng.randn(3, 3, C, Cout).astype(np.float32)
                    * 0.1).astype(dt)

    args = dict(p_x_st=0.1, p_x_ed=0.65, p_y_st=0.3, p_y_ed=0.85,
                circular=circ, grid_partial=0.6667)
    kw = dict(h=H, w=W, k=3, x_total=65, y_total=48)

    # XLA reference: grid sample + stride-3 conv (in the SAME dtype — for
    # bf16 this is the bf16 XLA tap/gather path the kernel approximates by
    # rounding the f32-lerped taps to bf16 entering the MXU)
    grid = sphere_patch_grid(args["p_x_st"], args["p_x_ed"], args["p_y_st"],
                             args["p_y_ed"], args["circular"],
                             args["grid_partial"], **kw)
    # grid stays f32: positions must floor() into the same cells as the
    # kernel's f32 offset tables; the lerp WEIGHTS are cast to x.dtype
    # inside bilinear_grid_sample, giving the bf16 XLA tap semantics
    sampled = bilinear_grid_sample(x, jnp.tile(grid[None], (B, 1, 1, 1)))
    want = _conv_stride3(sampled, w)

    # fused kernel
    t = sphere_offset_tables(args["p_x_st"], args["p_x_ed"], args["p_y_st"],
                             args["p_y_ed"], args["circular"],
                             args["grid_partial"], **kw)
    tables = {k2: jnp.tile(v[None], (B, 1, 1)) for k2, v in t.items()}
    w9 = w.reshape(9, C, Cout)
    got = fused_sphere_conv(x, tables, w9, interpret=True)

    assert got.dtype == dt
    if dt == jnp.bfloat16:
        # bf16: the kernel rounds once after an f32 lerp and accumulates
        # taps in f32, the XLA path lerps and accumulates in bf16 — agree
        # only to bf16 resolution (eps ~ 7.8e-3, 9*16-term dot products)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=0.15, rtol=0.05)
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


def test_offset_tables_reconstruct_grid(rng):
    """The (y, x) offsets reconstruct the dense grid exactly."""
    H = W = 35
    kw = dict(h=H, w=W, k=3, x_total=65, y_total=48)
    args = (0.05, 0.6, 0.2, 0.95, 0.0, 0.6667)
    grid = np.asarray(sphere_patch_grid(*args, **kw))  # (H*3, W*3, 2)
    t = jax.tree_util.tree_map(np.asarray,
                               sphere_offset_tables(*args, **kw))
    # dense pixel positions from the grid
    px = (grid[..., 0] + 1) / 2 * (W - 1)
    py = (grid[..., 1] + 1) / 2 * (H - 1)
    for r in range(0, H, 7):
        for ti in range(3):
            for tj in range(3):
                tt = ti * 3 + tj
                row_px = px[r * 3 + ti, tj::3]
                row_py = py[r * 3 + ti, tj::3]
                # px == c + dx, py == r + dy (constants per row/tap)
                np.testing.assert_allclose(
                    row_px - np.arange(W), row_px[0] - 0, atol=1e-4)
                np.testing.assert_allclose(row_py, row_py[0], atol=1e-4)
                dx = t["sx"][r, tt] + t["fx"][r, tt]
                np.testing.assert_allclose(row_px[0], dx, atol=1e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_grouped_kernel_matches_per_sample(dtype, rng):
    """fused_sphere_conv_grouped (lattice-engine fast path: one offset table
    shared by all panoramas folded at a lattice position) is bit-identical
    to the per-sample kernel with the table repeated, including the Bg>8
    subgroup normalization path.  Parametrized over f32 AND bf16: both
    kernels perform the identical per-element op sequence (f32 lerp, one
    bf16 round, f32 tap accumulation), so bit-identity must hold in bf16
    too — this pins the mxu_bf16 branch."""
    from spgan_tpu.ops.pallas.sphere_kernel import (
        fused_sphere_conv, fused_sphere_conv_grouped)

    dt = jnp.dtype(dtype)
    G, Bg, H, W, C, Cout, K2 = 2, 16, 13, 11, 16, 24, 9
    B = G * Bg
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(dt)
    w9 = jnp.asarray(rng.randn(K2, C, Cout).astype(np.float32)).astype(dt)
    tg = {
        "y0": jnp.asarray(rng.randint(0, H, (G, H, K2)).astype(np.int32)),
        "wy": jnp.asarray(rng.rand(G, H, K2).astype(np.float32)),
        "sx": jnp.asarray(rng.randint(-5, 5, (G, H, K2)).astype(np.int32)),
        "fx": jnp.asarray(rng.rand(G, H, K2).astype(np.float32)),
    }
    tg["y1"] = jnp.minimum(tg["y0"] + 1, H - 1)
    tp = {k: jnp.repeat(v, Bg, axis=0) for k, v in tg.items()}
    a = np.asarray(fused_sphere_conv(x, tp, w9))
    b = np.asarray(fused_sphere_conv_grouped(x, tg, w9, groups=G))
    np.testing.assert_array_equal(a, b)
