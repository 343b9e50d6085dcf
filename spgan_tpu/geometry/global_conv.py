"""Global-grid spherical convolution (full equirectangular feature maps).

Reference parity: models/spherenet/sphere_conv2d.py:SphereConv2d (:16-67) —
a conv whose input is grid-sampled by the *global* gnomonic pattern
(GridGenerator, grid_generator.py:12-108) then convolved with
stride == kernel_size.  IncreIntervalSphereConv2d (:70-121) is the
border-shrinking variant driven by IncreIntervalGridGenerator.

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

from spgan_tpu.geometry.sphere_grid import global_sphere_pattern
from spgan_tpu.ops.grid_sample import bilinear_grid_sample_shared


@lru_cache(maxsize=32)
def _global_grid_cached(h: int, w: int, k: int, stride: int) -> np.ndarray:
    pat = global_sphere_pattern(h, w, k, stride)  # (1, H*k, W*k, 2) (lat,lon)
    gy = pat[0, :, :, 0] / h * 2 - 1
    gx = pat[0, :, :, 1] / w * 2 - 1
    return np.stack([gx, gy], axis=-1).astype(np.float32)


@dataclass(frozen=True)
class GlobalSphereConv2d:
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

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B,H,W,C) full equirect feature map -> (B,H/s,W/s,out_ch)."""
        b, h, w, _ = x.shape
        k = self.kernel_size
        grid = jnp.asarray(_global_grid_cached(h, w, k, self.stride))
        sampled = bilinear_grid_sample_shared(x, grid)
        y = jax.lax.conv_general_dilated(
            sampled, params["weight"].astype(x.dtype) * self.scale,
            (k, k), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "bias" in params:
            y = y + params["bias"].astype(x.dtype)
        return y
