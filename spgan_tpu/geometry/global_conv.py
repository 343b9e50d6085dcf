"""Global-grid spherical convolutions (full equirectangular feature maps).

Reference parity: models/spherenet/sphere_conv2d.py —
  - SphereConv2d (:16-67): a conv whose input is grid-sampled by the
    *global* gnomonic pattern (GridGenerator, grid_generator.py:12-108)
    then convolved with stride == kernel_size.
  - IncreIntervalSphereConv2d (:70-121): the border-shrinking variant
    driven by IncreIntervalGridGenerator (grid_generator.py:385-577) —
    strided/upsampled convs re-spread their output centers over the full
    sphere so coverage never collapses toward the borders.

Both reference modules sample through the plain ``GridSampler`` whose
forward is F.grid_sample(mode='nearest', padding_mode='zeros',
align_corners=True) (grid_generator.py:580-585 -> grid_sample_grad_fix
.py:29-32); torch-oracle parity tests pin this (tests/test_models.py).

These are not used by the shipped SP-GAN configs (the patch model uses the
coords_partial-driven patch grids), but they complete the spherical-conv API
for full-pano models.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.geometry.sphere_grid import (global_sphere_pattern,
                                            incre_interval_pattern)
from spgan_tpu.ops.grid_sample import nearest_grid_sample_shared


@lru_cache(maxsize=32)
def _global_grid_cached(h: int, w: int, k: int, stride: int) -> np.ndarray:
    pat = global_sphere_pattern(h, w, k, stride)  # (1, H*k, W*k, 2) (lat,lon)
    gy = pat[0, :, :, 0] / h * 2 - 1
    gx = pat[0, :, :, 1] / w * 2 - 1
    return np.stack([gx, gy], axis=-1).astype(np.float32)


@lru_cache(maxsize=32)
def _incre_grid_cached(h: int, w: int, k: int, stride: int,
                       upsample: bool) -> np.ndarray:
    # (1, Ho*k, Wo*k, 2) (lat,lon) in INPUT pixel units; Ho/Wo shrink (or
    # grow, upsample=True) per the border-delete + linspace re-spread rule
    pat = incre_interval_pattern(h, w, k, stride, upsample)
    gy = pat[0, :, :, 0] / h * 2 - 1
    gx = pat[0, :, :, 1] / w * 2 - 1
    return np.stack([gx, gy], axis=-1).astype(np.float32)


@dataclass(frozen=True)
class _SphereConvBase:
    in_ch: int
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    bias: bool = True

    @property
    def scale(self) -> float:
        return 1.0 / math.sqrt(self.in_ch * self.kernel_size ** 2)

    def init(self, key: jax.Array) -> dict:
        k = self.kernel_size
        kw, kb = jax.random.split(key)
        params = {"weight": jax.random.normal(
            kw, (k, k, self.in_ch, self.out_ch), jnp.float32)}
        if self.bias:
            bound = 1.0 / math.sqrt(self.in_ch * k * k)
            params["bias"] = jax.random.uniform(kb, (self.out_ch,),
                                                jnp.float32, -bound, bound)
        return params

    def _grid(self, h: int, w: int) -> np.ndarray:
        raise NotImplementedError

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B,H,W,C) full equirect feature map -> (B,Ho,Wo,out_ch)."""
        _, h, w, _ = x.shape
        k = self.kernel_size
        grid = jnp.asarray(self._grid(h, w))
        sampled = nearest_grid_sample_shared(x, grid)
        y = jax.lax.conv_general_dilated(
            sampled, params["weight"].astype(x.dtype) * self.scale,
            (k, k), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "bias" in params:
            y = y + params["bias"].astype(x.dtype)
        return y


@dataclass(frozen=True)
class GlobalSphereConv2d(_SphereConvBase):
    """reference SphereConv2d (sphere_conv2d.py:16-67): output keeps the
    input lattice (one sample per input pixel / stride)."""

    def _grid(self, h: int, w: int) -> np.ndarray:
        return _global_grid_cached(h, w, self.kernel_size, self.stride)


@dataclass(frozen=True)
class IncreIntervalSphereConv2d(_SphereConvBase):
    """reference IncreIntervalSphereConv2d (sphere_conv2d.py:70-121): the
    sampling centers drop the border taps and are re-spread with linspace,
    so a stride-s conv shrinks (or, with upsample=True, grows) the map
    while keeping full spherical coverage."""
    upsample: bool = False

    def _grid(self, h: int, w: int) -> np.ndarray:
        return _incre_grid_cached(h, w, self.kernel_size, self.stride,
                                  self.upsample)
