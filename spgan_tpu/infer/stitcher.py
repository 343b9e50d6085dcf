"""Patch-lattice planning for stitched (infinite / closed-loop) generation.

Re-derives the stitching geometry of the reference test managers as a static
plan computed once per output size:

  * step sizes from the receptive-field algebra
    (base_test_manager.py:86-121 -> ops/spatial.derive_stitch_geometry)
  * lattice start points (+2 wrap columns for close-loop,
    close_loop_infinite_generation.py:428-460)
  * per-position crop descriptors (coords_partial) including the reference's
    test-time quirks: x_size = window+1 in the p_* fractions (:230-249) and
    get_circular_flag normalization (:462-472)
  * circular read margins: instead of runtime wrap-slicing
    (circular_sample_width :307-331), every circular field is padded once
    with its first `window` columns so all per-patch reads are plain static
    slices — jit/TPU friendly.

The plan is pure data; the managers compile ONE XLA program that gathers all
patch windows, runs the generator in folded batches, and scatters patches
into the meta image in the reference's row-major overwrite order.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from spgan_tpu.geometry.coords import CoordsPartial
from spgan_tpu.models.generator import Generator
from spgan_tpu.ops.spatial import StitchGeometry, in_size_chain

TEST_META_EXTRA_PAD = 3  # reference test_managers/global_config.py:1


@dataclass(frozen=True)
class LatticePlan:
    close_loop: bool
    target_h: int
    target_w: int
    meta_h: int
    meta_w: int
    num_steps_h: int
    num_steps_w: int          # includes wrap columns when close_loop
    num_steps_w_min: int      # excludes wrap columns
    window: int               # z window size (ss input, e.g. 35)
    z_field_h: int            # latent field height incl. ss padding
    z_field_w: int            # latent field width (circular when close_loop)
    geom: StitchGeometry
    # per-position (row-major, len = num_steps_h*num_steps_w):
    z_starts: np.ndarray          # (P, 2) row/col starts into padded z field
    noise_starts: List[np.ndarray]  # per layer (P, 2)
    img_starts: np.ndarray        # (P, 2) meta-image row/col (col pre-wrap)
    cp_scalars: np.ndarray        # (P, 5): p_x_st, p_x_ed, p_y_st, p_y_ed, circ
    x_total: int
    y_total: int
    noise_sizes: List[Tuple[int, int]]  # per-layer field (h, w) pre-padding

    @property
    def num_patches(self) -> int:
        return self.num_steps_h * self.num_steps_w

    def coords_partial(self, batch: int, start: int, count: int,
                       grid_partial: float) -> CoordsPartial:
        """CoordsPartial for positions [start, start+count), each repeated
        `batch` times (positions folded into the batch dim)."""
        import jax.numpy as jnp

        sl = self.cp_scalars[start:start + count]
        rep = np.repeat(sl, batch, axis=0)
        return CoordsPartial(
            p_x_st=jnp.asarray(rep[:, 0]), p_x_ed=jnp.asarray(rep[:, 1]),
            p_y_st=jnp.asarray(rep[:, 2]), p_y_ed=jnp.asarray(rep[:, 3]),
            circular=jnp.asarray(rep[:, 4]),
            x_total=self.x_total, y_total=self.y_total,
            grid_partial=grid_partial, test_flag=True)


def _mesh_starts(step: int, nh: int, nw: int) -> np.ndarray:
    ii, jj = np.meshgrid(np.arange(nh), np.arange(nw), indexing="ij")
    return np.stack([ii * step, jj * step], axis=-1).reshape(-1, 2)


def build_close_loop_plan(g: Generator, target_h: int, target_w: int
                          ) -> LatticePlan:
    geom = g.ts.stitch_geometry()
    patch = geom.outfeat_sizes[-1]
    px, zx = geom.pixelspace_step, geom.latentspace_step
    ss_pad = g.ss.unfold_size
    window = g.ts.ts_input_size + 2 * ss_pad

    nh = math.ceil((target_h - patch) / px) + TEST_META_EXTRA_PAD
    assert target_w % px == 0, (
        f"close-loop needs width divisible by the pixel step {px}")
    nw_min = target_w // px
    nw = nw_min + 2  # wrap columns
    meta_h = px * (nh - 1) + patch
    meta_w = nw_min * px

    # latent field: height covers meta_h, width is one full circle
    z_h_in = in_size_chain(g.ts.conv_specs_spatial(), meta_h)[0]
    z_field_h = z_h_in + 2 * ss_pad
    z_field_w = nw_min * zx
    x_total, y_total = z_field_h, z_field_w

    z_starts = []
    noise_starts = [[] for _ in geom.outfeat_steps]
    img_starts = []
    cp = []
    for i in range(nh):
        for j in range(nw):
            zr = i * zx                      # top row incl. padding offset
            zc_raw = j * zx
            zc = zc_raw % z_field_w          # circular read start
            z_starts.append((zr, zc))
            for li, ostep in enumerate(geom.outfeat_steps):
                nw_field = ostep * nw_min
                noise_starts[li].append((i * ostep, (j * ostep) % nw_field))
            img_starts.append((i * px, j * px))
            # reference coords_partial (close_loop:230-261 + :462-472)
            zy_st, zy_ed = zc_raw, zc_raw + window
            if zy_ed > y_total and zy_st >= y_total:
                zy_st = zy_st % y_total
                circ = False
            elif zy_ed > y_total:
                circ = True
            else:
                circ = False
            size1 = window + 1
            cp.append((zr / x_total, (zr + size1) / x_total,
                       zy_st / y_total, (zy_st + size1) / y_total,
                       float(circ)))

    noise_sizes = [
        (int(os_ * (nh - 1) + sz), int(os_ * nw_min))
        for os_, sz in zip(geom.outfeat_steps, geom.outfeat_sizes)]

    return LatticePlan(
        close_loop=True, target_h=target_h, target_w=target_w,
        meta_h=meta_h, meta_w=meta_w,
        num_steps_h=nh, num_steps_w=nw, num_steps_w_min=nw_min,
        window=window, z_field_h=z_field_h, z_field_w=z_field_w,
        geom=geom,
        z_starts=np.array(z_starts, np.int32),
        noise_starts=[np.array(v, np.int32) for v in noise_starts],
        img_starts=np.array(img_starts, np.int32),
        cp_scalars=np.array(cp, np.float64),
        x_total=x_total, y_total=y_total,
        noise_sizes=noise_sizes)


def build_infinite_plan(g: Generator, target_h: int, target_w: int
                        ) -> LatticePlan:
    """Planar (non-wrapping) lattice — the reference
    infinite_generation.py:268-291 / 393-423 behavior."""
    geom = g.ts.stitch_geometry()
    patch = geom.outfeat_sizes[-1]
    px, zx = geom.pixelspace_step, geom.latentspace_step
    ss_pad = g.ss.unfold_size
    window = g.ts.ts_input_size + 2 * ss_pad

    nh = math.ceil((target_h - patch) / px) + TEST_META_EXTRA_PAD
    nw = math.ceil((target_w - patch) / px) + TEST_META_EXTRA_PAD
    meta_h = px * (nh - 1) + patch
    meta_w = px * (nw - 1) + patch

    z_h_in = in_size_chain(g.ts.conv_specs_spatial(), meta_h)[0]
    z_w_in = in_size_chain(g.ts.conv_specs_spatial(), meta_w)[0]
    z_field_h = z_h_in + 2 * ss_pad
    z_field_w = z_w_in + 2 * ss_pad
    x_total, y_total = z_field_h, z_field_w

    z_starts, img_starts, cp = [], [], []
    noise_starts = [[] for _ in geom.outfeat_steps]
    for i in range(nh):
        for j in range(nw):
            z_starts.append((i * zx, j * zx))
            for li, ostep in enumerate(geom.outfeat_steps):
                noise_starts[li].append((i * ostep, j * ostep))
            img_starts.append((i * px, j * px))
            size1 = window + 1
            cp.append((i * zx / x_total, (i * zx + size1) / x_total,
                       j * zx / y_total, (j * zx + size1) / y_total, 0.0))

    noise_sizes = [
        (int(os_ * (nh - 1) + sz), int(os_ * (nw - 1) + sz))
        for os_, sz in zip(geom.outfeat_steps, geom.outfeat_sizes)]

    return LatticePlan(
        close_loop=False, target_h=target_h, target_w=target_w,
        meta_h=meta_h, meta_w=meta_w,
        num_steps_h=nh, num_steps_w=nw, num_steps_w_min=nw,
        window=window, z_field_h=z_field_h, z_field_w=z_field_w,
        geom=geom,
        z_starts=np.array(z_starts, np.int32),
        noise_starts=[np.array(v, np.int32) for v in noise_starts],
        img_starts=np.array(img_starts, np.int32),
        cp_scalars=np.array(cp, np.float64),
        x_total=x_total, y_total=y_total,
        noise_sizes=noise_sizes)
