"""Test-manager protocol: task_specific_init / run_next / save_results / exit
(reference test_managers/base_test_manager.py:147-159), plus the
--speed-benchmark timing semantics (test.py:84-91: per-call wall time with
device sync, first 10 samples discarded as warmup).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax

from spgan_tpu.config import Config
from spgan_tpu.infer.engine import PanoramaEngine
from spgan_tpu.infer.stitcher import LatticePlan
from spgan_tpu.models.generator import Generator


def save_image_batch(images: np.ndarray, save_root: str, start_id: int,
                     suffix: str = "") -> List[str]:
    """images: (B,H,W,3) in [-1,1] -> PNG files named like the reference
    (zero-padded global id, close_loop_infinite_generation.py:374-378)."""
    from PIL import Image

    os.makedirs(save_root, exist_ok=True)
    paths = []
    arr = np.clip((images + 1.0) / 2.0, 0.0, 1.0)
    arr = (arr * 255.0 + 0.5).astype(np.uint8)
    for i in range(arr.shape[0]):
        p = os.path.join(save_root, f"{start_id + i:06d}{suffix}.png")
        Image.fromarray(arr[i]).save(p)
        paths.append(p)
    return paths


@dataclass
class BaseManager:
    g: Generator
    params_ema: dict
    config: Config
    save_root: Optional[str] = None
    cur_global_id: int = 0
    accum_exec_times: List[float] = field(default_factory=list)
    engine: Optional[PanoramaEngine] = None
    full_image: Optional[np.ndarray] = None  # last uncropped meta batch

    @property
    def plan(self) -> LatticePlan:
        return self.engine.plan

    def task_specific_init(self, seed: Optional[int] = None) -> None:
        if self.config.task.init_index is not None:
            self.cur_global_id = self.config.task.init_index

    def _init_engine_mode(self, close_loop: bool) -> None:
        """Select the execution engine (task.engine): folded (single-device),
        sharded (lattice shard_map'ed over all devices), or halo
        (width-sharded fields + ppermute ring, close-loop only)."""
        mode = self.config.task.engine
        self._sharded_fn = None
        self._halo = False
        if mode == "folded":
            return
        if mode == "sharded":
            from spgan_tpu.parallel.mesh import make_mesh

            self._sharded_fn = self.engine.make_sharded_generate(make_mesh())
        elif mode == "halo":
            if not close_loop:
                raise ValueError(
                    "task.engine='halo' needs the close-loop manager "
                    "(width-sharded cylindrical fields)")
            self._halo = True
        else:
            raise ValueError(
                f"unknown task.engine {mode!r}; supported: folded | sharded "
                "| halo")

    def _build_engine(self, close_loop: bool) -> PanoramaEngine:
        from spgan_tpu.infer.stitcher import (build_close_loop_plan,
                                              build_infinite_plan)
        task = self.config.task
        build = build_close_loop_plan if close_loop else build_infinite_plan
        plan = build(self.g, task.height, task.width)
        # parallel_batch_size (reference base_test_manager.py:219-261: queue N
        # patch-kwargs and batch one G call) maps onto the engine's
        # patch_chunk — lattice positions folded into the device batch
        patch_chunk = task.parallel_batch_size or task.patch_chunk
        return PanoramaEngine(
            g=self.g, plan=plan, batch=task.batch_size,
            patch_chunk=patch_chunk,
            grid_partial=self.config.train_params.partial,
            compute_dtype=self.config.train_params.compute_dtype)

    # ---- TestingVars integration --------------------------------------
    def create_vars(self, key: jax.Array):
        """Sample the inference state bag (reference create_vars,
        close_loop_infinite_generation.py:84-168)."""
        from spgan_tpu.infer.testing_vars import TestingVars

        gl, z_field, noises = self.engine.sample_fields(key)
        return TestingVars(
            meta_img=None,
            global_latent=np.asarray(gl),
            local_latent=np.asarray(z_field),
            meta_coords=np.asarray(self.engine._coords_field),
            noises=[np.asarray(n) for n in noises])

    def generate_with_vars(self, vars) -> np.ndarray:
        """Full generation from an (edited) TestingVars bag."""
        import jax.numpy as jnp

        meta = self.engine.generate_from_fields(
            self.params_ema, jnp.asarray(vars.global_latent),
            jnp.asarray(vars.local_latent),
            [jnp.asarray(n) for n in vars.noises])
        vars.meta_img = np.asarray(meta)
        self.full_image = vars.meta_img
        return vars.meta_img

    def regenerate(self, vars, update_by_ss_map: Optional[np.ndarray] = None
                   ) -> np.ndarray:
        """Interactive partial update: recompute the lattice but only write
        patches whose latent window overlaps the selection map (z-space,
        (zh, zw) 0/1).  Untouched regions keep their previous pixels —
        matching the reference's update-map semantics
        (base_test_manager.py:330, close_loop:214-223)."""
        import jax.numpy as jnp

        assert vars.meta_img is not None, "generate_with_vars first"
        vars.meta_img = np.array(vars.meta_img)  # ensure writable copy
        plan = self.engine.plan
        patches = np.asarray(self.engine._generate_patches(
            self.params_ema, jnp.asarray(vars.global_latent),
            jnp.asarray(vars.local_latent),
            [jnp.asarray(n) for n in vars.noises]))
        win = plan.window
        patch_sz = plan.geom.outfeat_sizes[-1]
        meta = vars.meta_img
        for p in range(plan.num_patches):
            zr, zc = int(plan.z_starts[p, 0]), int(plan.z_starts[p, 1])
            if update_by_ss_map is not None:
                zw_total = vars.local_latent.shape[2]
                cols = [(zc + d) % zw_total for d in range(win)]
                sel = update_by_ss_map[zr:zr + win][:, cols]
                if not (sel > 0).any():
                    continue
            r, c_raw = int(plan.img_starts[p, 0]), int(plan.img_starts[p, 1])
            c = c_raw % plan.meta_w if plan.close_loop else c_raw
            patch = patches[p]
            if c + patch_sz <= plan.meta_w:
                meta[:, r:r + patch_sz, c:c + patch_sz] = patch
            else:
                split = plan.meta_w - c
                meta[:, r:r + patch_sz, c:] = patch[:, :, :split]
                meta[:, r:r + patch_sz, :patch_sz - split] = patch[:, :, split:]
        vars.meta_img = meta
        return meta

    def run_next(self, key: jax.Array, save: bool = True,
                 write_gpu_time: bool = False) -> np.ndarray:
        t0 = time.perf_counter() if write_gpu_time else None
        if getattr(self, "_halo", False):
            from spgan_tpu.infer.halo import generate_width_sharded
            from spgan_tpu.parallel.mesh import make_mesh

            meta = generate_width_sharded(
                self.g, self.params_ema, self.engine.plan, make_mesh(), key,
                self.engine.batch, self.engine.grid_partial,
                compute_dtype=self.engine.compute_dtype)
            import jax.numpy as jnp

            meta = jnp.asarray(meta)
        elif getattr(self, "_sharded_fn", None) is not None:
            gl, z_field, noises = self.engine.sample_fields(key)
            meta = self._sharded_fn(self.params_ema, gl, z_field, noises)
        else:
            meta = self.engine.generate(self.params_ema, key)
        if write_gpu_time:
            from spgan_tpu.utils.misc import sync_fetch

            sync_fetch(meta)  # host value fetch = the only reliable barrier
            dt = time.perf_counter() - t0
            self.accum_exec_times.append(dt)
            # per-day benchmark files next to the outputs (reference
            # infinite_generation.py:195-202 / close_loop:292-299)
            if self.save_root is not None:
                import datetime

                os.makedirs(self.save_root, exist_ok=True)
                fmt_date = datetime.date.today().strftime("%d-%m-%Y")
                path = os.path.join(self.save_root,
                                    f"speed_benchmark_{fmt_date}.txt")
                with open(path, "a") as f:
                    f.write(f"{dt:.6f}")
        # ONE device->host transfer of the uncropped meta; the target crop is
        # a host-side view of it (crop_to_target is a pure slice)
        self.full_image = np.asarray(meta)
        plan = self.engine.plan
        ph = (plan.meta_h - plan.target_h) // 2
        pw = (plan.meta_w - plan.target_w) // 2
        out = self.full_image[:, ph:ph + plan.target_h, pw:pw + plan.target_w]
        if save and self.save_root is not None:
            save_image_batch(out, self.save_root, self.cur_global_id)
        self.cur_global_id += out.shape[0]
        return out

    def save_full_imgs(self) -> None:
        """Save the last batch's uncropped meta images as <id>full.png
        (reference --save_all_space -> save_full_imgs,
        close_loop_infinite_generation.py:35-46; called after run_next, so
        ids are cur_global_id - batch + i)."""
        assert self.full_image is not None, \
            "run_next/generate_with_vars first"
        assert self.save_root is not None, \
            "save_full_imgs needs a save_root (manager built with None)"
        start = self.cur_global_id - self.full_image.shape[0]
        save_image_batch(self.full_image, self.save_root, start,
                         suffix="full")

    def get_exec_time_stats(self, warmup: int = 10):
        """Mean/std of per-call times, discarding the first `warmup` samples
        (reference test.py:108-121)."""
        t = np.asarray(self.accum_exec_times[warmup:] or
                       self.accum_exec_times)
        return float(t.mean()), float(t.std())

    def exit(self) -> None:
        return


@dataclass
class CloseLoopPanoramaManager(BaseManager):
    """Seamless 360-degree panorama generation — the headline capability
    (reference test_managers/close_loop_infinite_generation.py)."""

    def task_specific_init(self, seed: Optional[int] = None) -> None:
        super().task_specific_init(seed)
        self.engine = self._build_engine(close_loop=True)
        self._init_engine_mode(close_loop=True)


@dataclass
class InfiniteGenerationManager(BaseManager):
    """Planar arbitrary-size generation (reference
    test_managers/infinite_generation.py)."""

    def task_specific_init(self, seed: Optional[int] = None) -> None:
        super().task_specific_init(seed)
        self.engine = self._build_engine(close_loop=False)
        self._init_engine_mode(close_loop=False)
