"""Vectorized gnomonic (spherical) sampling-grid generation.

Replaces the reference's per-sample, per-layer CPU numpy grid construction
(models/spherenet/grid_generator.py:GridGeneratorPatchCoordsFixBorder.
createSamplingPattern, lines 138-283) with pure jnp math that runs in-graph,
vmaps over the batch, and is computed once per jit trace.  This removes the
reference's #1 performance sin: rebuilding numpy grids on the host for every
sample of every sphere conv of every step.

Math parity (reference line refs):
  * kernel offsets (grid_generator.py:303-324):
        kerX = tan(dx * dlon),  kerY = tan(dy * dlat) / cos(dy * dlon)
    with dlat = pi / x_total, dlon = 2*pi / y_total.
  * inverse gnomonic lat/lon per output pixel (:248-270).
  * patch angular ranges — the "linspace" branch (:222-246), which is the one
    exercised both in training (per-sample random crops) and by the shipped
    close-loop test manager (close_loop_infinite_generation.py:245-261; the
    full_shape/pre_sample branches are dead in the shipped configs).
  * min-max normalization + center-relative pattern trick (:326-352).
  * NOTE (faithful quirk): in training the reference hardcodes partial=0.8
    (grid_generator.py:164) and only honors the configured partial (0.6667)
    when test_flag is set (:166-167).  `grid_partial` must therefore be 0.8
    for training grids and config.partial for test grids.

Output convention: grid[..., 0] = gx (width/longitude), grid[..., 1] = gy
(height/latitude), both in [-1, 1] for align_corners=True sampling over the
patch itself — matching genSamplingPattern's normalization
(models/spgan_ops_gs.py:410-428).
"""
from __future__ import annotations

from functools import partial as _partial

import numpy as np
import jax
import jax.numpy as jnp

TWO_PI = 2.0 * np.pi


def _kernel_offsets(k: int, x_total: int, y_total: int):
    """Static (numpy) gnomonic kernel-tap offsets; k odd."""
    dlat = np.pi / x_total
    dlon = TWO_PI / y_total
    rng = np.arange(-(k // 2), k // 2 + 1, dtype=np.float64)
    kx1 = np.tan(rng * dlon)
    ky1 = np.tan(rng * dlat) / np.cos(rng * dlon)
    ker_x, ker_y = np.meshgrid(kx1, ky1)  # (k,k): ker_x varies on axis 1
    rho = np.sqrt(ker_x ** 2 + ker_y ** 2)
    rho[k // 2, k // 2] = 1e-8
    nu = np.arctan(rho)
    return ker_x, ker_y, rho, nu


def _min_max_norm(v: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.min(v)
    hi = jnp.max(v)
    return (v - lo) / (hi - lo) * 2.0 - 1.0


@_partial(jax.jit, static_argnames=("h", "w", "k", "x_total", "y_total"))
def sphere_patch_grid(p_x_st, p_x_ed, p_y_st, p_y_ed, circular,
                      grid_partial, *, h: int, w: int, k: int,
                      x_total: int, y_total: int) -> jnp.ndarray:
    """Sampling grid for one patch: returns (h*k, w*k, 2) in [-1, 1].

    p_* are scalar crop fractions (traced ok); `circular` is a bool/0-1 scalar;
    `grid_partial` is the vertical-extent fraction the *grid generator* uses
    (0.8 for training grids, config.partial for test grids — see module doc).
    """
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    ker_x, ker_y, rho, nu = _kernel_offsets(k, x_total, y_total)
    ker_x = jnp.asarray(ker_x, dtype)
    ker_y = jnp.asarray(ker_y, dtype)
    rho = jnp.asarray(rho, dtype)
    cos_nu = jnp.asarray(np.cos(nu), dtype)
    sin_nu = jnp.asarray(np.sin(nu), dtype)

    circular = jnp.asarray(circular, dtype)
    x_st = jnp.asarray(p_x_st, dtype) * np.pi * grid_partial
    x_ed = jnp.asarray(p_x_ed, dtype) * np.pi * grid_partial
    y_st = jnp.asarray(p_y_st, dtype) * TWO_PI
    y_ed_raw = jnp.asarray(p_y_ed, dtype) * TWO_PI
    # reference grid_generator.py:228-231: wrap y_ed unless it lands exactly
    # on 2*pi; then the circular flag extends it by a full turn (:241).
    y_ed = jnp.where(jnp.abs(y_ed_raw - TWO_PI) < 1e-9,
                     y_ed_raw, jnp.mod(y_ed_raw, TWO_PI))
    y_ed = y_ed + circular * TWO_PI

    lat_range = jnp.linspace(x_st, x_ed, h) - (np.pi / 2.0) * grid_partial
    lon_range = jnp.linspace(y_st, y_ed, w) - np.pi

    sin_lat = jnp.sin(lat_range)[:, None, None]
    cos_lat = jnp.cos(lat_range)[:, None, None]

    # clip: the argument is analytically in [-1,1] but f32 rounding can
    # overshoot, which would give NaN latitudes
    lat = jnp.arcsin(jnp.clip(
        cos_nu * sin_lat + ker_y * sin_nu * cos_lat / rho, -1.0, 1.0))  # (h,k,k)
    pattern = lat - lat[:, k // 2, k // 2][:, None, None]
    lat_norm = _min_max_norm(lat_range)[:, None, None] + pattern  # (h,k,k)

    lon_off = jnp.arctan(
        ker_x * sin_nu / (rho * cos_lat * cos_nu - ker_y * sin_lat * sin_nu)
    )  # (h,k,k)
    lon_norm = lon_off[:, None] + _min_max_norm(lon_range)[None, :, None, None]
    # lon_norm: (h, w, k, k)

    lat_full = jnp.broadcast_to(lat_norm[:, None], (h, w, k, k))
    # reorder to (h, kh, w, kw) and flatten -> (h*k, w*k)
    gy = lat_full.transpose(0, 2, 1, 3).reshape(h * k, w * k)
    gx = lon_norm.transpose(0, 2, 1, 3).reshape(h * k, w * k)
    return jnp.stack([gx, gy], axis=-1).astype(jnp.float32)


@_partial(jax.jit, static_argnames=("h", "w", "k", "x_total", "y_total"))
def sphere_offset_tables(p_x_st, p_x_ed, p_y_st, p_y_ed, circular,
                         grid_partial, *, h: int, w: int, k: int,
                         x_total: int, y_total: int):
    """Row-wise sampling offsets — the structural decomposition of the patch
    grid.  Because min-max normalization maps the (linear) lat/lon ranges to
    exact linspaces, the sampled position for output pixel (r, c), tap t is

        py = r + dy(r, t),   px = c + dx(r, t)

    i.e. every output row is a uniformly-translated bilinear resample of the
    input — no 2-D gather needed (this is what the Pallas kernel exploits).

    Returns dict with (h, k*k) arrays: y0, y1 (clamped int rows), wy (row
    frac), sx (int col shift), fx (col frac).  Tap order t = ti*k + tj matches
    the (H*k, W*k) grid layout of sphere_patch_grid.
    """
    dtype = jnp.float32
    ker_x, ker_y, rho, nu = _kernel_offsets(k, x_total, y_total)
    ker_x = jnp.asarray(ker_x, dtype)
    ker_y = jnp.asarray(ker_y, dtype)
    rho = jnp.asarray(rho, dtype)
    cos_nu = jnp.asarray(np.cos(nu), dtype)
    sin_nu = jnp.asarray(np.sin(nu), dtype)

    x_st = jnp.asarray(p_x_st, dtype) * np.pi * grid_partial
    x_ed = jnp.asarray(p_x_ed, dtype) * np.pi * grid_partial
    lat_range = jnp.linspace(x_st, x_ed, h) - (np.pi / 2.0) * grid_partial
    sin_lat = jnp.sin(lat_range)[:, None, None]
    cos_lat = jnp.cos(lat_range)[:, None, None]
    lat = jnp.arcsin(jnp.clip(
        cos_nu * sin_lat + ker_y * sin_nu * cos_lat / rho, -1.0, 1.0))
    pattern = lat - lat[:, k // 2, k // 2][:, None, None]      # (h,k,k)
    lon_off = jnp.arctan(
        ker_x * sin_nu / (rho * cos_lat * cos_nu - ker_y * sin_lat * sin_nu))

    dy = pattern.reshape(h, k * k) * (h - 1) / 2.0
    dx = lon_off.reshape(h, k * k) * (w - 1) / 2.0

    rows = jnp.arange(h, dtype=dtype)[:, None]
    py = rows + dy
    y_floor = jnp.floor(py)
    wy = (py - y_floor).astype(dtype)
    y0 = jnp.clip(y_floor.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y_floor.astype(jnp.int32) + 1, 0, h - 1)
    sx = jnp.floor(dx).astype(jnp.int32)
    fx = (dx - jnp.floor(dx)).astype(dtype)
    return {"y0": y0, "y1": y1, "wy": wy, "sx": sx, "fx": fx}


def training_col_margin(w: int, k: int, x_total: int, y_total: int,
                        grid_partial: float, n: int = 8193) -> int:
    """Worst-case column-shift margin of the offset tables over ALL training
    crops at layer width ``w``.

    dx(r, t) = lon_off(lat_r, t) * (w - 1) / 2 depends only on the row
    latitude, and training-crop latitudes lie inside
    [-pi/2, pi/2] * grid_partial (coords.sample_training: p_x in [0, 1],
    lat = linspace(p_x_st, p_x_ed)*pi*gp - pi/2*gp), so a dense latitude
    sweep bounds the integer shift sx = floor(dx) for every possible crop.
    Returns M guaranteeing sx in [-M, M-1] (the tap-conv contract), min 6.

    This is the training-time counterpart of the engine's exact lattice-plan
    margins (infer/engine.py): there cp is static so max|sx| is measured; here
    cp is traced so the bound is analytic over the crop distribution.
    """
    ker_x, ker_y, rho, nu = _kernel_offsets(k, x_total, y_total)
    cos_nu, sin_nu = np.cos(nu), np.sin(nu)
    half = np.pi / 2.0 * grid_partial
    lat = np.linspace(-half, half, n)
    sin_lat = np.sin(lat)[:, None, None]
    cos_lat = np.cos(lat)[:, None, None]
    lon_off = np.arctan(
        ker_x * sin_nu / (rho * cos_lat * cos_nu - ker_y * sin_lat * sin_nu))
    dx = lon_off.reshape(n, k * k) * (w - 1) / 2.0
    sx = np.floor(dx).astype(np.int64)
    return max(6, int(-sx.min()), int(sx.max()) + 1)


def sphere_offset_tables_batch(cp, h: int, w: int, k: int = 3) -> dict:
    """Batched offset tables from a CoordsPartial: dict of (B, h, k*k)."""
    fn = lambda a, b, c, d, e: sphere_offset_tables(
        a, b, c, d, e, cp.grid_partial,
        h=h, w=w, k=k, x_total=cp.x_total, y_total=cp.y_total)
    return jax.vmap(fn)(cp.p_x_st, cp.p_x_ed, cp.p_y_st, cp.p_y_ed,
                        cp.circular.astype(jnp.float32))


def sphere_patch_grid_batch(cp, h: int, w: int, k: int = 3) -> jnp.ndarray:
    """Batched grids from a CoordsPartial struct-of-arrays: (B, h*k, w*k, 2)."""
    fn = lambda a, b, c, d, e: sphere_patch_grid(
        a, b, c, d, e, cp.grid_partial,
        h=h, w=w, k=k, x_total=cp.x_total, y_total=cp.y_total)
    return jax.vmap(fn)(cp.p_x_st, cp.p_x_ed, cp.p_y_st, cp.p_y_ed,
                        cp.circular.astype(jnp.float32))


def _grid_from_ranges(lat_range: np.ndarray, lon_range: np.ndarray, k: int,
                      x_total: int, y_total: int) -> np.ndarray:
    """Shared tail of the patch grid math: gnomonic taps around explicit
    lat/lon center ranges, min-max normalized (numpy host path)."""
    ker_x, ker_y, rho, nu = _kernel_offsets(k, x_total, y_total)
    cos_nu, sin_nu = np.cos(nu), np.sin(nu)
    sin_lat = np.sin(lat_range)[:, None, None]
    cos_lat = np.cos(lat_range)[:, None, None]
    lat = np.arcsin(np.clip(
        cos_nu * sin_lat + ker_y * sin_nu * cos_lat / rho, -1.0, 1.0))
    pattern = lat - lat[:, k // 2, k // 2][:, None, None]

    def mm(v):
        return (v - v.min()) / (v.max() - v.min()) * 2.0 - 1.0

    lat_norm = mm(lat_range)[:, None, None] + pattern
    lon_off = np.arctan(ker_x * sin_nu /
                        (rho * cos_lat * cos_nu - ker_y * sin_lat * sin_nu))
    lon_norm = lon_off[:, None] + mm(lon_range)[None, :, None, None]
    h, w = len(lat_range), len(lon_range)
    lat_full = np.broadcast_to(lat_norm[:, None], (h, w, k, k))
    gy = lat_full.transpose(0, 2, 1, 3).reshape(h * k, w * k)
    gx = lon_norm.transpose(0, 2, 1, 3).reshape(h * k, w * k)
    return np.stack([gx, gy], axis=-1).astype(np.float32)


def sphere_patch_grid_presampled(p_x_st: float, p_x_ed: float,
                                 p_y_st: float, p_y_ed: float,
                                 circular: bool, partial: float,
                                 full_shape, k: int,
                                 x_total: int, y_total: int,
                                 pre_sample_mode: bool = False) -> np.ndarray:
    """The reference's presampled test modes (grid_generator.py:169-221):
    centers are taken from linspaces over the FULL latent field instead of a
    per-patch linspace.  `full_shape` = (field_h, field_w).  test-with-
    full_shape uses exclusive-1 end indices; pre_sample_mode uses +1 ends.
    Dead in the shipped close-loop flow (full_shape is commented out there)
    but part of the grid generator's behavior surface."""
    fh, fw = full_shape
    if pre_sample_mode:
        x_st = round(p_x_st * x_total)
        x_ed = round(p_x_ed * x_total) + 1
        y_st = round(p_y_st * y_total)
        y_ed = round(p_y_ed * y_total) + 1
    else:
        x_st = round(p_x_st * x_total)
        x_ed = round(p_x_ed * x_total) - 1
        y_st = round(p_y_st * y_total)
        y_ed = round(p_y_ed * y_total) - 1
    all_x = np.linspace(-np.pi * partial / 2, np.pi * partial / 2, fh)
    all_y = np.linspace(-np.pi, np.pi, fw)
    lat_range = all_x[x_st:x_ed]
    if circular and not (pre_sample_mode and y_ed == fw):
        y_ed = y_ed % fw
        lon_range = np.concatenate([all_y[y_st:], all_y[:y_ed] + 2 * np.pi])
    else:
        lon_range = all_y[y_st:y_ed]
    return _grid_from_ranges(lat_range, lon_range, k, x_total, y_total)


def incre_interval_pattern(h: int, w: int, k: int, stride: int = 1,
                           upsample: bool = False) -> np.ndarray:
    """Border-shrinking global pattern for stride-2 / upsample sphere convs
    (reference IncreIntervalGridGenerator, grid_generator.py:385-577): the
    output lat/lon centers are re-spread over the full sphere with linspace
    after dropping the border taps, so strided/upsampled convs keep full
    coverage.  Returns (1, Ho*k, Wo*k, 2) in pixel units (lat, lon)."""
    ker_x, ker_y, rho, nu = _kernel_offsets(k, h, w)
    cos_nu, sin_nu = np.cos(nu), np.sin(nu)

    def centers(n, delete, s):
        if k == 1:
            return np.arange(0, n, s).astype(np.float64)
        if k % 2 == 0:
            base = np.arange(0, n, s)[delete - 1: -delete]
        elif s == 1:
            base = np.arange(0, n, s)[delete: -delete]
        elif s == 2 and delete == 1:
            base = np.arange(0, n, s)
        else:
            base = np.arange(0, n, s)[delete - 1: -delete + 1]
        return np.linspace(0, n, len(base))

    if upsample:
        out_h = stride * (h - k * stride * 2 - 1) + (1 + stride * 2) * k
        out_w = stride * (w - k * stride * 2 - 1) + (1 + stride * 2) * k
        h_range = np.linspace(0, h, out_h)
        w_range = np.linspace(0, w, out_w)
    else:
        h_range = centers(h, k // 2, stride)
        w_range = centers(w, k // 2, stride)

    lat_range = ((h_range / h) - 0.5) * np.pi
    lon_range = ((w_range / w) - 0.5) * TWO_PI

    sin_lat = np.sin(lat_range)[:, None, None]
    cos_lat = np.cos(lat_range)[:, None, None]
    lat = np.arcsin(cos_nu * sin_lat + ker_y * sin_nu * cos_lat / rho)
    lon = np.arctan(ker_x * sin_nu /
                    (rho * cos_lat * cos_nu - ker_y * sin_lat * sin_nu))
    lat = lat[:, None] + np.zeros((1, len(lon_range), 1, 1))
    lon = lon[:, None] + lon_range[None, :, None, None]
    lat = (lat / np.pi + 0.5) * h
    lon = ((lon / TWO_PI + 0.5) * w) % w
    latlon = np.stack([lat, lon], axis=-1).transpose(0, 2, 1, 3, 4)
    oh, ow = latlon.shape[0] * k, latlon.shape[2] * k
    return latlon.reshape(1, oh, ow, 2)


def global_sphere_pattern(h: int, w: int, k: int, stride: int = 1) -> np.ndarray:
    """Global equirectangular gnomonic pattern in *pixel index* units,
    (1, H*Kh, W*Kw, 2) with channel order (lat, lon) — parity with the
    reference's GridGenerator.createSamplingPattern
    (grid_generator.py:28-85). Pure numpy (precompute-once)."""
    ker_x, ker_y, rho, nu = _kernel_offsets(k, h, w)
    cos_nu, sin_nu = np.cos(nu), np.sin(nu)
    h_range = np.arange(0, h, stride)
    w_range = np.arange(0, w, stride)
    lat_range = ((h_range / h) - 0.5) * np.pi
    lon_range = ((w_range / w) - 0.5) * TWO_PI

    sin_lat = np.sin(lat_range)[:, None, None]
    cos_lat = np.cos(lat_range)[:, None, None]
    lat = np.arcsin(cos_nu * sin_lat + ker_y * sin_nu * cos_lat / rho)
    lon = np.arctan(ker_x * sin_nu /
                    (rho * cos_lat * cos_nu - ker_y * sin_lat * sin_nu))
    lat = lat[:, None] + np.zeros((1, len(lon_range), 1, 1))
    lon = lon[:, None] + lon_range[None, :, None, None]
    lat = (lat / np.pi + 0.5) * h
    lon = ((lon / TWO_PI + 0.5) * w) % w
    latlon = np.stack([lat, lon], axis=-1)  # (H, W, k, k, 2)
    latlon = latlon.transpose(0, 2, 1, 3, 4)  # (H, kh, W, kw, 2)
    oh, ow = latlon.shape[0] * k, latlon.shape[2] * k
    return latlon.reshape(1, oh, ow, 2)
