"""Bilinear grid sampling (align_corners=True, border padding) + the
straight-through variant used by the spherical convs.

Behavioral parity targets (reference file:line):
  - F.grid_sample(..., align_corners=True, mode='bilinear',
    padding_mode='border')  — used by GridSamplerNew / GridSamplerFuncNoGrad
    (models/spherenet/grid_generator.py:588-613)
  - GridSamplerFuncNoGrad.backward (grid_generator.py:615-623): the gradient
    w.r.t. the input is NOT the bilinear adjoint; it is the mean over each
    3x3 sampled block of the output cotangent, scaled by 0.1 (a training
    trick).  The gradient w.r.t. the grid is zero.

TPU-native notes:
  * The sampler is 4 XLA gathers + lerp; layout NHWC.
  * The straight-through backward is expressed with stop_gradient algebra
    instead of jax.custom_vjp so that R1/PPL double-grad works (custom_vjp is
    not twice-differentiable in JAX).  The linear surrogate
    ``(0.1/9) * nearest_upsample_3(z)`` has exactly the required VJP:
    d/dz -> 0.1 * blockmean_3x3(cotangent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """x: (B,H,W,C); grid: (B,Ho,Wo,2) with grid[...,0]=gx (width dir),
    grid[...,1]=gy (height dir), both in [-1,1], align_corners=True,
    border padding.  Returns (B,Ho,Wo,C)."""
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0).astype(x.dtype)[..., None]
    wy = (gy - y0).astype(x.dtype)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    def gather(yi, xi):
        # flatten spatial dims -> one gather per corner
        flat = x.reshape(b, h * w, c)
        idx = yi * w + xi  # (B,Ho,Wo)
        return jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(idx.shape + (c,))

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_grid_sample_shared(x: jnp.ndarray, grid: jnp.ndarray
                                ) -> jnp.ndarray:
    """Grid shared across the batch: x (B,H,W,C), grid (Ho,Wo,2).

    The gather indices are batch- and channel-independent, which lets XLA
    fetch whole (B,...,C) slabs per sampled point instead of per-sample
    gathers — the fast path for lattice inference where every pano in the
    batch shares one sampling pattern per lattice position."""
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0).astype(x.dtype)[None, ..., None]
    wy = (gy - y0).astype(x.dtype)[None, ..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    flat = x.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(-1)  # (Ho*Wo,) shared
        return jnp.take(flat, idx, axis=1).reshape(b, *yi.shape, c)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def nearest_grid_sample_shared(x: jnp.ndarray, grid: jnp.ndarray
                               ) -> jnp.ndarray:
    """Nearest-neighbor sampling, grid shared across the batch
    (x (B,H,W,C), grid (Ho,Wo,2) in [-1,1]) — align_corners=True,
    padding_mode='zeros'.

    Parity target: the reference's plain ``GridSampler`` forward
    (grid_sample_grad_fix.py:29-32: F.grid_sample(mode='nearest',
    padding_mode='zeros', align_corners=True)), used by the global-grid
    sphere convs (sphere_conv2d.py:30,87).  torch rounds half-to-even
    (std::nearbyint) — so does jnp.round."""
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    xi = jnp.round(gx).astype(jnp.int32)
    yi = jnp.round(gy).astype(jnp.int32)
    inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    flat = x.reshape(b, h * w, c)
    idx = (yi * w + xi).reshape(-1)
    v = jnp.take(flat, idx, axis=1).reshape(b, *yi.shape, c)
    return v * inb.astype(x.dtype)[None, ..., None]


def tap_conv_tables(z: jnp.ndarray, tables: dict, w9: jnp.ndarray,
                    margin: int = 6, groups: int = 0) -> jnp.ndarray:
    """Fused sphere resample + stride-k conv from row-offset tables, in pure
    XLA (no Pallas, no 2-D gathers).

    Exploits the uniform-row-translation structure of the gnomonic patch grid
    (geometry/sphere_grid.sphere_offset_tables): output pixel (r, c), tap t
    samples the input at (r + dy(r,t), c + dx(r,t)).  Per tap this is

      * two contiguous ROW gathers (y0/y1) + a vertical lerp, then
      * a per-row integer column shift — enumerated over the <= 2*margin
        distinct shifts as static slices + masked accumulation (no gather
        at all on the column axis), then a horizontal lerp, then
      * one (H*W, C) x (C, Cout) contraction.

    This replaces the 4 point-gathers over the (kH, kW) resampled map that
    `st_grid_sample_3x3` + stride-k conv lowers to — the dominant residual
    bandwidth cost of the TS sphere skip convs (VERDICT r2 weak #1).

    z: (B,H,W,C); tables: dict of (B,H,K2) arrays, or (G,H,K2) with
    groups=G > 0 (each table shared by B//G consecutive samples);
    w9: (K2,C,Cout).  `margin` must satisfy margin >= max(-sx) and
    margin-1 >= max(sx) (callers derive it from the static lattice plan).
    Returns (B,H,W,Cout).  Differentiable (true gradients); see st_tap_conv
    for the straight-through variant.
    """
    B, H, W, C = z.shape
    K2, _, Cout = w9.shape
    M = margin
    G = groups if groups else B
    Bg = B // G
    assert B % G == 0, (B, G)
    zg = z.reshape(G, Bg, H, W, C)
    sx_all = jnp.clip(tables["sx"], -M, M - 1)

    y = jnp.zeros((G, Bg, H, W, Cout), z.dtype)
    for t in range(K2):
        y0 = tables["y0"][:, :, t][:, None, :, None, None]  # (G,1,H,1,1)
        y1 = tables["y1"][:, :, t][:, None, :, None, None]
        wy = tables["wy"][:, :, t].astype(z.dtype)[:, None, :, None, None]
        r0 = jnp.take_along_axis(zg, y0, axis=2)
        r1 = jnp.take_along_axis(zg, y1, axis=2)
        mixed = r0 * (1 - wy) + r1 * wy                      # (G,Bg,H,W,C)
        pad = jnp.pad(mixed, ((0, 0), (0, 0), (0, 0), (M, M), (0, 0)),
                      mode="edge")
        sx = sx_all[:, :, t]                                 # (G,H)
        acc = jnp.zeros((G, Bg, H, W + 1, C), z.dtype)
        for s in range(-M, M):
            mask = (sx == s).astype(z.dtype)[:, None, :, None, None]
            acc = acc + pad[:, :, :, M + s:M + s + W + 1, :] * mask
        fx = tables["fx"][:, :, t].astype(z.dtype)[:, None, :, None, None]
        tap = acc[:, :, :, :W] * (1 - fx) + acc[:, :, :, 1:] * fx
        y = y + jnp.einsum("gbhwc,co->gbhwo", tap, w9[t])
    return y.reshape(B, H, W, Cout)


def st_tap_conv(z: jnp.ndarray, tables: dict, w9: jnp.ndarray,
                margin: int = 6, groups: int = 0) -> jnp.ndarray:
    """Straight-through tap conv: forward == tap_conv_tables (==
    conv(st_grid_sample_3x3(z, grid)) bit-for-math); backward gives the
    TRUE gradient to ``w9`` (through the primal tap values) and the
    reference's 0.1-blockmean gradient to ``z``
    (GridSamplerFuncNoGrad.backward, grid_generator.py:615-623, composed
    with the stride-k conv adjoint).  Double-grad safe (stop_gradient
    algebra, no custom_vjp)."""
    primal = tap_conv_tables(jax.lax.stop_gradient(z), tables, w9,
                             margin=margin, groups=groups)
    # surrogate: (0.1/9) * 1x1 conv with the tap-summed (stop-grad) weight —
    # its VJP towards z is exactly 0.1 * blockmean_{3x3}(conv-adjoint), and
    # it contributes no weight gradient
    wsum = jax.lax.stop_gradient(w9.sum(axis=0)).astype(z.dtype)
    lin = (0.1 / w9.shape[0]) * jnp.einsum("bhwc,co->bhwo", z, wsum)
    return primal + lin - jax.lax.stop_gradient(lin)


def _nearest_upsample3(z: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,3H,3W,C) by repetition."""
    return jnp.repeat(jnp.repeat(z, 3, axis=1), 3, axis=2)


def st_grid_sample_3x3(z: jnp.ndarray, grid: jnp.ndarray,
                       grid_groups: int = 0) -> jnp.ndarray:
    """Straight-through sampler for (B,H,W,C) -> (B,3H,3W,C) sphere-conv
    resampling.  Forward == bilinear_grid_sample; backward w.r.t. ``z`` is
    0.1 * mean over each 3x3 block of the cotangent; no gradient to ``grid``.

    grid_groups > 0: the batch is G groups of B//G samples sharing one grid
    per group — grid has shape (G, 3H, 3W, 2) and the fast shared-index
    gather is used (inference lattice path).
    """
    assert grid.shape[-3] == 3 * z.shape[1] and grid.shape[-2] == 3 * z.shape[2], (
        z.shape, grid.shape)
    zs = jax.lax.stop_gradient(z)
    gs = jax.lax.stop_gradient(grid)
    if grid_groups:
        g = grid_groups
        b = z.shape[0] // g
        zg = zs.reshape(g, b, *z.shape[1:])
        primal = jax.vmap(bilinear_grid_sample_shared)(zg, gs)
        primal = primal.reshape(z.shape[0], *primal.shape[2:])
    else:
        primal = bilinear_grid_sample(zs, gs)
    lin = (0.1 / 9.0) * _nearest_upsample3(z)
    return primal + lin - jax.lax.stop_gradient(lin)
