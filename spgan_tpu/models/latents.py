"""Latent sampling (reference latent_sampler.py) with explicit jax.random keys.

  * sample_global_latent :13-30 — (B, 2, D) pair; the second entry equals the
    first unless a style-mixing coin flip (p = mixing) succeeds.
  * sample_local_latent :50-88 — (B, S+2*ss_pad, S+2*ss_pad, C) including the
    GNN padding ring.
  * sample_circular_local_latent_patch101 :205-245 — circular latent field for
    closed-loop panoramas; width = meta_width / pixel_step * latent_step
    (the reference hardcodes the 96/6 table; here the steps come from the
    receptive-field algebra, so any width divisible by the pixel step works).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LatentSampler:
    global_dim: int = 512
    local_dim: int = 256
    ts_input_size: int = 11
    ss_unfold_size: int = 12
    mixing: float = 0.9

    def sample_global(self, key: jax.Array, batch: int,
                      mixing: bool = True) -> jnp.ndarray:
        k1, k2, kc = jax.random.split(key, 3)
        z1 = jax.random.normal(k1, (batch, self.global_dim))
        z2 = jax.random.normal(k2, (batch, self.global_dim))
        if mixing:
            do_mix = jax.random.uniform(kc, ()) < self.mixing
            z2 = jnp.where(do_mix, z2, z1)
        else:
            z2 = z1
        return jnp.stack([z1, z2], axis=1)

    def local_shape(self, spatial_size_enlarge: float = 1,
                    specific_shape: Optional[Tuple[int, int]] = None,
                    exclude_padding: bool = False,
                    padding_size: int = 0) -> Tuple[int, int]:
        """padding_size adds extra rows/cols BEFORE the SS ring — the
        reference's sample_slicing_local_latent (latent_sampler.py:131-179),
        used by sliced/outpainting generation."""
        if specific_shape is not None:
            s = specific_shape
        elif spatial_size_enlarge != 1:
            base = self.ts_input_size // 2
            size = int(round(base * spatial_size_enlarge)) * 2 + 1
            s = (size, size)
        else:
            s = (self.ts_input_size, self.ts_input_size)
        s = (s[0] + padding_size, s[1] + padding_size)
        if not exclude_padding:
            s = (s[0] + 2 * self.ss_unfold_size, s[1] + 2 * self.ss_unfold_size)
        return s

    def sample_local(self, key: jax.Array, batch: int,
                     spatial_size_enlarge: float = 1,
                     specific_shape: Optional[Tuple[int, int]] = None,
                     exclude_padding: bool = False,
                     padding_size: int = 0) -> jnp.ndarray:
        h, w = self.local_shape(spatial_size_enlarge, specific_shape,
                                exclude_padding, padding_size)
        return jax.random.normal(key, (batch, h, w, self.local_dim))

    def sample_circular_local(self, key: jax.Array, batch: int,
                              width_latent: int, height_in: int,
                              height_padding: bool = True) -> jnp.ndarray:
        """Circular (cylindrical) latent field for closed-loop generation:
        width wraps; height gets the SS padding ring."""
        h = height_in + (2 * self.ss_unfold_size if height_padding else 0)
        return jax.random.normal(key, (batch, h, width_latent, self.local_dim))
