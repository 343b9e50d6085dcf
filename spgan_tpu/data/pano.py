"""Panorama data preparation: cubemap -> equirectangular projection.

Replaces the reference's external `cube2sphere` binary + multiprocess driver
(gen_pano_dataset.py:15-28,100-117) with an in-repo vectorized projection.
The reference renders Matterport3D's 6 skybox faces to a 768x384 equirect
image and then clips vertically to the middle 2/3 (edge_cutoff_ratio=0.6667 ==
train_params.partial) giving 768x256.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

# Matterport skybox face order used by the reference's cube2sphere call:
# (front, right, back, left, top, bottom) per gen_pano_dataset.py
FACES = ("front", "right", "back", "left", "top", "bottom")


def _face_uv(direction: np.ndarray):
    """Map unit direction vectors (..., 3) to (face_index, u, v) in [0,1]."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)

    face = np.zeros(x.shape, np.int32)
    u = np.zeros(x.shape, np.float64)
    v = np.zeros(x.shape, np.float64)

    # +x: front(0), -x: back(2), +y: right(1), -y: left(3),
    # +z: top(4), -z: bottom(5)
    m = (ax >= ay) & (ax >= az) & (x > 0)
    face[m], u[m], v[m] = 0, (y[m] / ax[m]), (-z[m] / ax[m])
    m = (ax >= ay) & (ax >= az) & (x <= 0)
    face[m], u[m], v[m] = 2, (-y[m] / ax[m]), (-z[m] / ax[m])
    m = (ay > ax) & (ay >= az) & (y > 0)
    face[m], u[m], v[m] = 1, (-x[m] / ay[m]), (-z[m] / ay[m])
    m = (ay > ax) & (ay >= az) & (y <= 0)
    face[m], u[m], v[m] = 3, (x[m] / ay[m]), (-z[m] / ay[m])
    m = (az > ax) & (az > ay) & (z > 0)
    face[m], u[m], v[m] = 4, (y[m] / az[m]), (x[m] / az[m])
    m = (az > ax) & (az > ay) & (z <= 0)
    face[m], u[m], v[m] = 5, (y[m] / az[m]), (-x[m] / az[m])

    return face, (u + 1) / 2, (v + 1) / 2


def cubemap_to_equirect(faces: Dict[str, np.ndarray], width: int = 768,
                        height: int = 384,
                        edge_cutoff_ratio: float = 0.6667) -> np.ndarray:
    """faces: dict of 6 (S, S, 3) uint8/float arrays keyed by FACES names.
    Returns the vertically-clipped equirect pano
    (round(height*ratio), width, 3)."""
    lon = (np.arange(width) + 0.5) / width * 2 * np.pi - np.pi
    lat = np.pi / 2 - (np.arange(height) + 0.5) / height * np.pi
    lon, lat = np.meshgrid(lon, lat)
    d = np.stack([np.cos(lat) * np.cos(lon),
                  np.cos(lat) * np.sin(lon),
                  np.sin(lat)], axis=-1)
    face, u, v = _face_uv(d)

    s = faces[FACES[0]].shape[0]
    stack = np.stack([np.asarray(faces[k]) for k in FACES])  # (6,S,S,3)
    ui = np.clip((u * s).astype(np.int32), 0, s - 1)
    vi = np.clip((v * s).astype(np.int32), 0, s - 1)
    out = stack[face, vi, ui]

    clip_h = int(round(height * edge_cutoff_ratio))
    top = (height - clip_h) // 2
    return out[top:top + clip_h]
