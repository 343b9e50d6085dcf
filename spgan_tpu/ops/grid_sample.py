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
