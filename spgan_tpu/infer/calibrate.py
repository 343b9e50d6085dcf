"""Spatial-shape calibration: map features/pixel locations between layers of
the no-padding architecture.

Reference parity: ModulatedConv2d.calibrate_spatial_shape
(models/ops.py:352-489) and its composition over the TS conv stack
(spgan.py:774-790) and SS (spgan.py:208-227).  Used by spatial style fusion,
outpainting-with-inverted-latents and interactive editing to reverse-engineer
pixel-space placements into every layer's feature space.

direction "backward" (image -> z): for a plain no-pad conv, pad the dirty ring
back; for an upsample conv, pad the dirty ring then bilinear-resize
(align_corners=True) down to the input size.  pin_loc tracks one pixel through
the same transformations.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from spgan_tpu.ops.grid_sample import bilinear_grid_sample
from spgan_tpu.ops.spatial import ConvSpec


def resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate parity),
    x: (B,H,W,C)."""
    gy = jnp.linspace(-1.0, 1.0, out_h)
    gx = jnp.linspace(-1.0, 1.0, out_w)
    gxx, gyy = jnp.meshgrid(gx, gy)
    grid = jnp.stack([gxx, gyy], -1)[None]
    grid = jnp.tile(grid, (x.shape[0], 1, 1, 1))
    return bilinear_grid_sample(x, grid)


def _pad_edge(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="edge")


def calibrate_backward(specs: Sequence[ConvSpec], feature: jnp.ndarray,
                       pin_loc: Optional[Tuple[int, int]] = None):
    """Walk the conv stack output->input. Returns (features, pin_locs), one
    entry per layer, ordered from the image side toward z."""
    feats: List[jnp.ndarray] = []
    pins: List[Optional[Tuple[int, int]]] = []
    for spec in reversed(list(specs)):
        h, w = feature.shape[1], feature.shape[2]
        in_h, in_w = spec.in_size(h), spec.in_size(w)
        d0, d1 = spec.dirty_rm
        if spec.upsample:
            if (d0, d1) != (0, 0):
                feature = _pad_edge(feature, d0, d1)
            feature = resize_align_corners(feature, in_h, in_w)
            if pin_loc is not None:
                p = (pin_loc[0] + d0, pin_loc[1] + d1)
                old_c = (h + d0, w + d1)
                new_c = (old_c[0] // 2, old_c[1] // 2)
                pin_loc = ((p[0] - old_c[0]) // 2 + new_c[0],
                           (p[1] - old_c[1]) // 2 + new_c[1])
        else:
            if (d0, d1) != (0, 0):
                feature = _pad_edge(feature, d0, d1)
            if pin_loc is not None:
                pin_loc = (pin_loc[0] + d0, pin_loc[1] + d1)
        feats.append(feature)
        pins.append(pin_loc)
    return feats, pins


def calibrate_backward_ss(n_layers: int, unfold_radius: int,
                          feature: jnp.ndarray,
                          pin_loc: Optional[Tuple[int, int]] = None):
    """SS stack backward: sphere convs are size-preserving; each planar k7
    conv pads unfold_radius per side (reference spgan.py:208-227 via the k=7
    StyledConv's dirty ring)."""
    feats, pins = [], []
    r = unfold_radius
    for _ in range(n_layers):
        feature = _pad_edge(feature, r, r)
        if pin_loc is not None:
            pin_loc = (pin_loc[0] + r, pin_loc[1] + r)
        feats.append(feature)   # after planar
        feats.append(feature)   # sphere: identity
        pins.append(pin_loc)
        pins.append(pin_loc)
    return feats, pins
