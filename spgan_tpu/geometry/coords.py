"""Spherical coordinate fields and crop bookkeeping.

Re-implements the behavior of the reference coordinate handler
(coord_handler.py:SphereCoordHandlerV3BatchDiff) as pure functions:

  * constant coordinate grid construction  (coord_handler.py:575-653)
  * training crop sampling with horizontal wrap-around (:736-785,907-921)
  * the batch-shared sub-pixel jitter (:923-931 — ONE perturbation per batch,
    the V3 "BatchDiff" behavior, unlike the per-sample V1 jitter)
  * tanh/cos/sin input encodings (:658-734); with the shipped
    ss_coord_all_layers == "each_layer" the raw indices flow into the model
    and each SS block re-encodes after grid sampling (:677-679)
  * ac_coords for the discriminator's auxiliary head (:986-1026)
  * the `coords_partial` crop descriptor (:1027-1038) — here a typed
    struct-of-arrays (CoordsPartial) instead of a list of python dicts.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class CoordsPartial:
    """Batch of crop descriptors. p_* are fractions of the coordinate field;
    `circular` marks crops that wrap around the horizontal seam.

    Static metadata: x_total/y_total are the coordinate-field size the
    fractions refer to; `grid_partial` is the vertical-extent fraction used by
    the gnomonic grid generator (0.8 for training grids — a faithful
    reference quirk, see sphere_grid.py — and config.partial at test time);
    `test_flag` mirrors the reference's test-mode switch.
    """

    p_x_st: jnp.ndarray
    p_x_ed: jnp.ndarray
    p_y_st: jnp.ndarray
    p_y_ed: jnp.ndarray
    circular: jnp.ndarray
    x_total: int = field(metadata=dict(static=True), default=45)
    y_total: int = field(metadata=dict(static=True), default=140)
    grid_partial: float = field(metadata=dict(static=True), default=0.8)
    test_flag: bool = field(metadata=dict(static=True), default=False)

    @property
    def batch(self) -> int:
        return self.p_x_st.shape[0]


def encode_coords(coords: jnp.ndarray, num_dir: int = 3) -> jnp.ndarray:
    """Raw index coords -> network input encoding, channel-last.

    num_dir==3: (tanh(x), cos(pi*y), sin(pi*y))
    (reference coord_handler.py:677-683 / spgan_ops_gs.py:799-802)."""
    if num_dir == 3:
        return jnp.stack([
            jnp.tanh(coords[..., 0]),
            jnp.cos(coords[..., 1] * np.pi),
            jnp.sin(coords[..., 2] * np.pi),
        ], axis=-1)
    if num_dir == 5:
        return jnp.stack([
            jnp.tanh(coords[..., 0]),
            jnp.cos(coords[..., 1] * np.pi),
            jnp.sin(coords[..., 2] * np.pi),
            jnp.cos(coords[..., 3] * np.pi * 2),
            jnp.cos(coords[..., 4] * np.pi * 3),
        ], axis=-1)
    if num_dir == 1:
        return jnp.tanh(coords)
    if num_dir == 2:
        # reference coord_handler.py:662-677: the shipped (no sin_cos_act /
        # sphere attr) branch is the identity
        return coords
    if num_dir == 4:
        return jnp.stack([
            jnp.cos(coords[..., 0] * np.pi),
            jnp.sin(coords[..., 0 + 1] * np.pi),
            jnp.cos(coords[..., 2] * np.pi),
            jnp.sin(coords[..., 3] * np.pi),
        ], axis=-1)
    if num_dir == 21:
        # multi-frequency Fourier features (coord_handler.py:689-693):
        # tanh(x), then cos/sin(y * pi * 2^i) for i in 0..9
        parts = [jnp.tanh(coords[..., 0])]
        for i in range(10):
            parts.append(jnp.cos(coords[..., i * 2 + 1] * np.pi * 2 ** i))
            parts.append(jnp.sin(coords[..., i * 2 + 2] * np.pi * 2 ** i))
        return jnp.stack(parts, axis=-1)
    raise NotImplementedError(f"coord_num_dir={num_dir}")


@dataclass(frozen=True)
class CoordGrid:
    """The constant coordinate field + crop/jitter sampling logic.

    With the shipped config: ss window 35, vert_sample 10, hori_occupy 0.25 =>
    field is 45 x 140, x in [-3, 3] (cut_pt), y in [-1, 1]
    (coord_handler.py:493-510).
    """

    ts_input_size: int = 11
    ss_unfold_size: int = 12
    vert_sample_size: int = 10
    hori_occupy_ratio: float = 0.25
    vert_cut_pt: float = 3.0
    num_dir: int = 3
    partial: float = 0.6667
    # coord_continuous (reference coord_handler.py:511-547): True -> training
    # crops get the shared half-cell sub-pixel jitter; False -> discrete
    # coords, zero perturbation ("[!] Discrete coords should be depricated!")
    continuous: bool = True

    @property
    def ss_spatial_size(self) -> int:
        return self.ts_input_size + 2 * self.ss_unfold_size  # 35

    @property
    def size_x(self) -> int:
        return self.ss_spatial_size + self.vert_sample_size  # 45

    @property
    def size_y(self) -> int:
        return int(round(self.ss_spatial_size / self.hori_occupy_ratio))  # 140

    # ---- constant grid ------------------------------------------------
    def base_grid(self, height: Optional[int] = None,
                  width: Optional[int] = None,
                  coord_init: Tuple[float, float] = (0.0, 0.0)) -> np.ndarray:
        """(H, W, num_dir) raw coordinate field, channel-last.

        Mirrors _creat_coord_grid (coord_handler.py:575-653): x is normalized
        by (size_x - 1), recentered so it never exceeds +-1 before the cut_pt
        gain; y is normalized by (size_y - 1).
        """
        h = self.size_x if height is None else height
        w = self.size_y if width is None else width
        x = (np.arange(h, dtype=np.float64) + coord_init[0]) / (self.size_x - 1)
        y = (np.arange(w, dtype=np.float64) + coord_init[1]) / (self.size_y - 1)
        exceeding = x[-1] - 1.0
        x = x - exceeding / 2.0
        x = (x * 2.0 - 1.0) * self.vert_cut_pt
        y = y * 2.0 - 1.0
        xx = np.repeat(x[:, None], w, axis=1)
        yy = np.repeat(y[None, :], h, axis=0)
        if self.num_dir == 3:
            grid = np.stack([xx, yy, yy], axis=-1)
        elif self.num_dir == 1:
            grid = xx[..., None]
        else:
            raise NotImplementedError(f"num_dir={self.num_dir}")
        return grid.astype(np.float32)

    def perturb_ranges(self) -> np.ndarray:
        """Half-pixel jitter amplitude per channel (coord_handler.py:536-541)."""
        g = self.base_grid()
        if self.num_dir == 3:
            return np.array([
                abs(g[0, 0, 0] - g[1, 0, 0]) / 2,
                abs(g[0, 0, 1] - g[0, 1, 1]) / 2,
                abs(g[0, 0, 2] - g[0, 1, 2]) / 2,
            ], np.float32)
        raise NotImplementedError

    # ---- training-time sampling ---------------------------------------
    def sample_training(self, key: jax.Array, batch: int):
        """Random 35x35 crops of the constant field with wrap + shared jitter.

        Returns (coords (B,35,35,C) raw, ac_coords (B,C), CoordsPartial).
        """
        size = self.ss_spatial_size
        kx, ky, kp = jax.random.split(key, 3)
        x_st = jax.random.randint(kx, (batch,), 0, self.vert_sample_size)
        y_st = jax.random.randint(ky, (batch,), 0, self.size_y)

        base = jnp.asarray(self.base_grid())  # (45,140,C)
        padded = jnp.concatenate([base, base[:, :size]], axis=1)  # wrap margin

        def pick(xs, ys):
            return jax.lax.dynamic_slice(
                padded, (xs, ys, 0), (size, size, padded.shape[-1]))

        coords = jax.vmap(pick)(x_st, y_st)  # (B,35,35,C)

        # ONE shared jitter per batch per channel (coord_handler.py:923-931);
        # disabled entirely with coord_continuous=False (:546-547)
        if self.continuous:
            pr = jnp.asarray(self.perturb_ranges())
            jitter = (jax.random.uniform(kp, (pr.shape[0],)) * 2.0 - 1.0) * pr
            coords = coords + jitter[None, None, None, :]

        ac = self._ac_coords(x_st, y_st)
        cp = self._coords_partial(x_st, y_st, size, size)
        return coords, ac, cp

    def _ac_coords(self, x_st, y_st):
        # coord_handler.py:986-1021 (num_dir == 3 path)
        nx = (x_st / (self.vert_sample_size - 1)) * 2.0 - 1.0
        ny = (y_st / (self.size_y - 1)) * 2.0 - 1.0
        return jnp.stack(
            [nx, jnp.cos(ny * np.pi), jnp.sin(ny * np.pi)], axis=-1
        ).astype(jnp.float32)

    def _coords_partial(self, x_st, y_st, x_size, y_size) -> CoordsPartial:
        # coord_handler.py:1027-1038; circular iff the y window wraps.
        return CoordsPartial(
            p_x_st=x_st / self.size_x,
            p_x_ed=(x_st + x_size - 1) / self.size_x,
            p_y_st=y_st / self.size_y,
            p_y_ed=(y_st + y_size - 1) / self.size_y,
            circular=(y_st + y_size > self.size_y),
            x_total=self.size_x,
            y_total=self.size_y,
            grid_partial=0.8,  # faithful reference quirk (training grids)
            test_flag=False,
        )

    def sample_training_extrap(self, key: jax.Array, batch: int, size: int):
        """Training coords for windows larger than the constant field
        (reference coord_handler.py:968-978: build fresh extrapolated grids
        from random crop origins instead of slicing the field). Used by the
        EXT2-FID generation path."""
        kx, ky, kp = jax.random.split(key, 3)
        x_st = jax.random.randint(kx, (batch,), 0, self.vert_sample_size)
        y_st = jax.random.randint(ky, (batch,), 0, self.size_y)

        def grid_for(xs, ys):
            x = (jnp.arange(size) + xs) / (self.size_x - 1)
            y = (jnp.arange(size) + ys) / (self.size_y - 1)
            x = x - (x[-1] - 1.0) / 2.0
            x = (x * 2.0 - 1.0) * self.vert_cut_pt
            y = y * 2.0 - 1.0
            xx = jnp.repeat(x[:, None], size, axis=1)
            yy = jnp.repeat(y[None, :], size, axis=0)
            return jnp.stack([xx, yy, yy], axis=-1)

        coords = jax.vmap(grid_for)(x_st.astype(jnp.float32),
                                    y_st.astype(jnp.float32))
        if self.continuous:
            pr = jnp.asarray(self.perturb_ranges())
            jitter = (jax.random.uniform(kp, (pr.shape[0],)) * 2.0 - 1.0) * pr
            coords = coords + jitter[None, None, None, :]
        ac = self._ac_coords(x_st, y_st)
        cp = CoordsPartial(
            p_x_st=x_st / self.size_x,
            p_x_ed=(x_st + size - 1) / self.size_x,
            p_y_st=y_st / self.size_y,
            p_y_ed=(y_st + size - 1) / self.size_y,
            circular=jnp.zeros((batch,), bool),
            x_total=self.size_x, y_total=self.size_y,
            grid_partial=0.8, test_flag=False)
        return coords, ac, cp

    # ---- test-time field ----------------------------------------------
    def test_field(self, height: int, width: int) -> np.ndarray:
        """Deterministic coordinate field over the full inference latent
        (coord_handler.py:1051-1058 via _creat_coord_grid, center-aligned)."""
        return self.base_grid(height=height, width=width)
