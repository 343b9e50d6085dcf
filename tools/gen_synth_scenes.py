#!/usr/bin/env python
"""Procedural cubemap scene generator for training rehearsals.

Round-3's sustained runs (docs/runs/RUN5K.md) used procedurally generated
cubemap scenes to exercise the REAL data path end-to-end (cube faces ->
tools/prepare_records.py cube2equirect -> pack -> SPR loader -> train) in an
environment without the Matterport3D skybox data the reference ingests
(/root/reference/gen_pano_dataset.py:15-28).  This tool regenerates such
scenes deterministically so the chain is reproducible across rounds.

Each scene is seeded and layered to have image-like statistics (rather than
white noise): a vertical sky/ground gradient keyed to face orientation, two
octaves of smooth value noise, and a few solid quads — enough spatial
structure for the GAN losses to have non-degenerate gradients over hours of
training.

  python tools/gen_synth_scenes.py --out DIR --n-scenes 256 --face-size 256
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FACE_UP_WEIGHT = {"top": 1.0, "bottom": -1.0,
                  "front": 0.0, "back": 0.0, "left": 0.0, "right": 0.0}


def _value_noise(rng, size, cells):
    """One octave of bilinear value noise in [0,1], (size,size)."""
    grid = rng.rand(cells + 1, cells + 1).astype(np.float32)
    t = np.linspace(0, cells, size, endpoint=False, dtype=np.float32)
    i = np.minimum(t.astype(np.int32), cells - 1)
    f = t - i
    g = grid[i][:, i]
    gx = grid[i + 1][:, i]
    gy = grid[i][:, i + 1]
    gxy = grid[i + 1][:, i + 1]
    fy, fx = f[:, None], f[None, :]
    return (g * (1 - fy) * (1 - fx) + gx * fy * (1 - fx)
            + gy * (1 - fy) * fx + gxy * fy * fx)


def render_scene(seed: int, size: int) -> dict:
    """Render the 6 cube faces of one procedural scene as uint8 RGB."""
    rng = np.random.RandomState(seed)
    sky = rng.rand(3).astype(np.float32) * 0.5 + 0.5
    ground = rng.rand(3).astype(np.float32) * 0.4
    tint = rng.rand(3).astype(np.float32) * 0.6 + 0.4
    faces = {}
    for name, w in FACE_UP_WEIGHT.items():
        if w == 0.0:  # side faces: vertical gradient sky->ground
            a = np.linspace(1, 0, size, dtype=np.float32)[:, None, None]
            base = a * sky + (1 - a) * ground
        else:  # top/bottom: uniform sky or ground
            base = np.broadcast_to(sky if w > 0 else ground,
                                   (size, size, 3)).copy()
        n = (_value_noise(rng, size, 4)[..., None] * 0.5
             + _value_noise(rng, size, 16)[..., None] * 0.25)
        img = np.clip(base * (0.7 + 0.6 * n * tint), 0, 1)
        for _ in range(rng.randint(2, 6)):  # a few solid quads
            h = rng.randint(size // 8, size // 2)
            wd = rng.randint(size // 8, size // 2)
            y = rng.randint(0, size - h)
            x = rng.randint(0, size - wd)
            img[y:y + h, x:x + wd] = (
                img[y:y + h, x:x + wd] * 0.3
                + rng.rand(3).astype(np.float32) * 0.7)
        faces[name] = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return faces


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-scenes", type=int, default=256)
    ap.add_argument("--face-size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for s in range(args.n_scenes):
        sdir = os.path.join(args.out, f"scene{s:04d}")
        os.makedirs(sdir, exist_ok=True)
        for name, img in render_scene(args.seed + s, args.face_size).items():
            Image.fromarray(img).save(os.path.join(sdir, f"{name}.png"))
    print(f"generated {args.n_scenes} scenes -> {args.out}")


if __name__ == "__main__":
    main()
