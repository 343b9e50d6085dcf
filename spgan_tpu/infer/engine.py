"""The jitted lattice engine shared by the infinite / close-loop managers.

TPU-native replacement for the reference's per-patch python loop
(close_loop_infinite_generation.py:170-305): ONE compiled XLA program that

  1. samples latent/noise fields in-graph,
  2. pads circular fields once (so every per-patch read is a dynamic_slice),
  3. runs the generator over the lattice in folded batches
     (chunk positions x batch panoramas) under lax.map,
  4. scatters the patches into the meta image with the reference's row-major
     overwrite order (overlaps overwrite, no blending — bit-consistency comes
     from the shared fields and exact step algebra).

The reference rebuilds numpy sphere grids on the host per patch per sphere
conv; here grids are jnp expressions evaluated on-device inside the same
program.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.geometry.coords import CoordsPartial
from spgan_tpu.infer.stitcher import LatticePlan
from spgan_tpu.models.generator import Generator


def render_chunk(g: Generator, params, styles, gz, ss_maps,
                 z_pad, coords_pad, noises_pad, zs, ns, cps, *,
                 batch: int, chunk: int, win: int, out_sizes, x_total: int,
                 y_total: int, grid_partial: float, cdt,
                 use_pallas: bool, skip_sizes, use_skip_tables: bool,
                 skip_margins) -> jnp.ndarray:
    """Render `chunk` lattice positions x `batch` panoramas in ONE folded
    generator call — the shared hot body of the single-device engine, the
    lattice-sharded engine, and the width-sharded halo path (infer/halo.py).

    zs (chunk,2) / ns [per-layer (chunk,2)] are start indices into the
    (pre-padded or halo-extended) z/coords/noise fields; cps (chunk,5) are
    the CoordsPartial scalars for each position.  Sphere grids / row-offset
    tap tables are evaluated in-graph from cps (one per position, shared by
    the folded batch).  Returns (chunk, batch, patch, patch, 3) in `cdt`.
    """
    B = batch

    def slice_z(start):
        r, c = start[0], start[1]
        zw = jax.lax.dynamic_slice(
            z_pad, (0, r, c, 0), (B, win, win, g.ts.local_dim))
        cw = jax.lax.dynamic_slice(
            coords_pad, (r, c, 0), (win, win, coords_pad.shape[-1]))
        return zw, cw

    zw, cw = jax.vmap(slice_z)(zs)               # (chunk,B,..), (chunk,..)
    zw = zw.reshape(chunk * B, win, win, -1).astype(cdt)
    cw = jnp.repeat(cw, B, axis=0)               # (chunk*B, win, win, 3)

    layer_noises = []
    for li, sz in enumerate(out_sizes):
        def slice_n(start, n=noises_pad[li], s=sz):
            return jax.lax.dynamic_slice(
                n, (0, start[0], start[1], 0), (B, s, s, 1))
        nw = jax.vmap(slice_n)(ns[li])
        layer_noises.append(nw.reshape(chunk * B, sz, sz, 1).astype(cdt))

    # one CoordsPartial / sphere grid per lattice position, shared by
    # all B panoramas (batch-shared gathers in the samplers)
    cp = CoordsPartial(
        p_x_st=cps[:, 0], p_x_ed=cps[:, 1],
        p_y_st=cps[:, 2], p_y_ed=cps[:, 3], circular=cps[:, 4],
        x_total=x_total, y_total=y_total,
        grid_partial=grid_partial, test_flag=True)
    from spgan_tpu.geometry.sphere_grid import (
        sphere_offset_tables, sphere_patch_grid_batch)

    ss_sizes = g.ss.layer_sizes(win)
    ss_grids = [sphere_patch_grid_batch(cp, s, s) for s in ss_sizes]
    tables_list = None
    if use_pallas:
        def tab(sz):
            fn = lambda a, b2, c2, d, e: sphere_offset_tables(
                a, b2, c2, d, e, grid_partial, h=sz, w=sz, k=3,
                x_total=x_total, y_total=y_total)
            # one table per lattice position, shared by the B folded
            # panoramas at that position (tables_groups)
            return jax.vmap(fn)(cp.p_x_st, cp.p_x_ed, cp.p_y_st,
                                cp.p_y_ed, cp.circular)

        tables_list = [tab(s) for s in ss_sizes]
    skip_grids = None
    skip_tables = None
    if use_skip_tables:
        from spgan_tpu.geometry.sphere_grid import sphere_offset_tables_batch

        skip_tables = [sphere_offset_tables_batch(cp, s, s)
                       for s in skip_sizes]
    else:
        skip_grids = [sphere_patch_grid_batch(cp, s, s) for s in skip_sizes]

    gz_t = jnp.tile(gz, (chunk, 1)).astype(cdt)
    styles_t = jnp.tile(styles, (chunk, 1, 1)).astype(cdt)

    ss_noises = None
    if ss_maps:
        # same map at every position: tile matches the chunk-major fold
        # order of zw
        ss_noises = [jnp.tile(m, (chunk, 1, 1, 1)).astype(cdt)
                     for m in ss_maps]
    structure = g.ss.apply(params["ss"], gz_t, zw, cw, cp,
                           grids=ss_grids, grid_groups=chunk,
                           tables_list=tables_list, tables_groups=chunk,
                           noises=ss_noises)
    img = g.ts.synthesize(params["ts"], structure, styles_t, cp,
                          noises=layer_noises, skip_grids=skip_grids,
                          grid_groups=chunk, skip_tables=skip_tables,
                          skip_margins=skip_margins, tables_groups=chunk)
    patch_sz = out_sizes[-1]
    return img.reshape(chunk, B, patch_sz, patch_sz, 3)


@dataclass
class PanoramaEngine:
    g: Generator
    plan: LatticePlan
    batch: int
    patch_chunk: int = 4
    grid_partial: float = 0.6667
    compute_dtype: str = "float32"
    use_pallas: Optional[bool] = None  # default: on for TPU backends
    # row-offset-table path for the TS sphere skip convs (st_tap_conv);
    # default follows use_pallas
    use_skip_tables: Optional[bool] = None
    dedup_wrap: bool = True  # skip re-rendering the close-loop wrap columns

    def __post_init__(self):
        if self.g.ss is None:
            # The engine's lattice math threads SS coords/cp through every
            # patch; a planar (styleGAN2_baseline / no-SS) generator has no
            # coord grid to build the field from. Reject loudly instead of
            # AttributeError-ing deep inside sample_fields.
            raise ValueError(
                "PanoramaEngine requires a generator with use_ss=true; "
                "got a planar generator (g.ss is None). Planar stitched "
                "generation is not a shipped reference path either "
                "(its InfinityGAN managers assume the SS coord handler, "
                "test_managers/base_test_manager.py:40).")
        plan = self.plan
        P = plan.num_patches
        # Close-loop wrap columns (j >= num_steps_w_min) are bit-identical
        # re-renders of columns j - num_steps_w_min: their cp normalizes to
        # the same fractions (stitcher.py:122-133) and their z/noise slices
        # read the same circular-field windows, so the same program produces
        # the same bits (pinned by tests/test_stitcher.py wrap identity).
        # Render each distinct column once; the wrapping scatter writes the
        # seam region with the identical values the reference's overwrite
        # order would have produced.
        if plan.close_loop and self.dedup_wrap and self._wrap_cols_dedupable():
            nw, nwm = plan.num_steps_w, plan.num_steps_w_min
            self._render_idx = np.array(
                [p for p in range(P) if p % nw < nwm], np.int32)
            self._full_map = np.array(
                [(p // nw) * nwm + (p % nw) % nwm for p in range(P)], np.int32)
        else:
            self._render_idx = np.arange(P, dtype=np.int32)
            self._full_map = np.arange(P, dtype=np.int32)
        p = len(self._render_idx)
        if p % self.patch_chunk != 0:
            # fall back to a divisor
            for c in range(self.patch_chunk, 0, -1):
                if p % c == 0:
                    self.patch_chunk = c
                    break
        if self.use_pallas is None:
            self.use_pallas = jax.default_backend() == "tpu"
        self._coords_field = jnp.asarray(
            self.g.ss.coord_grid.test_field(self.plan.z_field_h,
                                            self.plan.z_field_w))
        # Exact per-size shift margins for the skip-conv tap path: cp_scalars
        # are static, so the integer column shifts are known at plan time
        # (max|sx| grows with the layer size — 8 at 53^2 vs 6 at the SS 35^2).
        _, _, i2j = self.g.ts.plan()
        out_sizes = self.plan.geom.outfeat_sizes
        self._skip_sizes = [out_sizes[src - 2] for src in sorted(i2j)]
        if self.use_skip_tables is None:
            self.use_skip_tables = bool(self.use_pallas)
        if self.use_skip_tables:
            from spgan_tpu.geometry.sphere_grid import (
                sphere_offset_tables_batch)

            cp_all = plan.coords_partial(1, 0, plan.num_patches,
                                         self.grid_partial)
            self._skip_margins = []
            for s in self._skip_sizes:
                t = sphere_offset_tables_batch(cp_all, s, s)
                mx = int(np.abs(np.asarray(t["sx"])).max())
                self._skip_margins.append(max(6, mx + 1))
        else:
            self._skip_margins = None
        self._generate = jax.jit(
            functools.partial(self._generate_impl, return_patches=False))
        self._generate_patches = jax.jit(
            functools.partial(self._generate_impl, return_patches=True))

    def _wrap_cols_dedupable(self) -> bool:
        """Wrap column j is a bit-identical re-render of base column
        j - num_steps_w_min iff its cp scalars are exactly equal (its z/noise
        slice starts are congruent by construction).  This fails for narrow
        panoramas where a base column's own window wraps: the reference
        circular-flag algorithm (close_loop:462-472) then gives the base
        column circular=True but the wrap column circular=False, i.e. a
        different sphere grid (see tests/test_stitcher.py:81-86)."""
        plan = self.plan
        nw, nwm = plan.num_steps_w, plan.num_steps_w_min
        cps = plan.cp_scalars.reshape(plan.num_steps_h, nw, 5)
        return all(
            np.array_equal(cps[:, j], cps[:, j - nwm])
            for j in range(nwm, nw))

    # ----------------------------------------------------------------
    def sample_fields(self, key: jax.Array):
        """Latent + noise fields for one batch of panoramas (host-callable,
        also traced inside the jitted program).

        When ss_disable_noise is False, per-sample SS noise maps are APPENDED
        to the noises list (after the TS noise fields): the reference's
        test-time NoiseInjection cache hands every patch the same per-sample
        map (models/ops.py:740-773 — SS feature sizes never change), so one
        (B, s, s, 1) map per SS layer reproduces its semantics and rides the
        TestingVars save/edit flows unchanged."""
        plan = self.plan
        kg, kz, kn = jax.random.split(key, 3)
        gl = jax.random.normal(kg, (self.batch, 2, self.g.ts.global_dim))
        gl = gl.at[:, 1].set(gl[:, 0])  # no mixing at test
        z_field = jax.random.normal(
            kz, (self.batch, plan.z_field_h, plan.z_field_w,
                 self.g.ts.local_dim))
        noises = [
            jax.random.normal(jax.random.fold_in(kn, i),
                              (self.batch, h, w, 1))
            for i, (h, w) in enumerate(plan.noise_sizes)]
        if not self.g.ss.disable_noise:
            kss = jax.random.fold_in(kn, 10 ** 6)
            noises += [
                jax.random.normal(jax.random.fold_in(kss, i),
                                  (self.batch, s, s, 1))
                for i, s in enumerate(self.g.ss.noise_sizes(plan.window))]
        return gl, z_field, noises

    # ----------------------------------------------------------------
    def _patches_from_starts(self, params, gl, z_field, noises,
                             z_starts, n_starts, cp_all):
        """Render the lattice positions described by the start/cp arrays
        (already chunk-grouped: (N//chunk, chunk, ...)).  Returns
        (N, B, patch, patch, 3) float32 patches.  This is the shared body of
        the single-device and shard_map'ed paths."""
        plan = self.plan
        g = self.g
        B = self.batch
        chunk = self.patch_chunk
        win = plan.window
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

        # SS noise maps (appended by sample_fields when enabled) are shared
        # by every lattice position — split them off the TS noise fields
        n_ts = len(plan.noise_sizes)
        ss_maps = noises[n_ts:]
        noises = noises[:n_ts]

        # --- static circular padding (reads never wrap afterwards) ---
        if plan.close_loop:
            z_pad = jnp.concatenate([z_field, z_field[:, :, :win]], axis=2)
            coords_pad = jnp.concatenate(
                [self._coords_field, self._coords_field[:, :win]], axis=1)
            noises_pad = [
                jnp.concatenate([n, n[:, :, :osz]], axis=2)
                for n, osz in zip(noises, plan.geom.outfeat_sizes)]
        else:
            z_pad, coords_pad, noises_pad = z_field, self._coords_field, noises

        styles = g.build_styles(params, gl, None)  # (B, n_latent, D)
        gz = gl[:, 0]

        out_sizes = plan.geom.outfeat_sizes
        patch_sz = out_sizes[-1]

        def gen_chunk(args):
            zs, ns, cps = args  # (chunk,2), [per-layer (chunk,2)], (chunk,5)
            return render_chunk(
                g, params, styles, gz, ss_maps, z_pad, coords_pad,
                noises_pad, zs, ns, cps, batch=B, chunk=chunk, win=win,
                out_sizes=out_sizes, x_total=plan.x_total,
                y_total=plan.y_total, grid_partial=self.grid_partial,
                cdt=cdt, use_pallas=self.use_pallas,
                skip_sizes=self._skip_sizes,
                use_skip_tables=self.use_skip_tables,
                skip_margins=self._skip_margins)

        patches = jax.lax.map(gen_chunk, (z_starts, n_starts, cp_all))
        patches = patches.reshape(-1, B, patch_sz, patch_sz, 3)
        return patches.astype(jnp.float32)

    def _generate_impl(self, params, gl, z_field, noises,
                       return_patches=False):
        plan = self.plan
        chunk = self.patch_chunk
        ridx = self._render_idx
        P = len(ridx)

        z_starts = jnp.asarray(plan.z_starts[ridx]).reshape(
            P // chunk, chunk, 2)
        n_starts = [jnp.asarray(s[ridx]).reshape(P // chunk, chunk, 2)
                    for s in plan.noise_starts]
        cp_all = jnp.asarray(plan.cp_scalars[ridx].astype(np.float32)).reshape(
            P // chunk, chunk, 5)

        patches = self._patches_from_starts(params, gl, z_field, noises,
                                            z_starts, n_starts, cp_all)
        if return_patches:
            # expand back to the full lattice (wrap columns point at their
            # bit-identical base-column renders)
            return patches[jnp.asarray(self._full_map)]
        return self._scatter_jnp(patches)

    def _scatter_jnp(self, patches):
        """Device-side meta assembly (static, reference overwrite order).

        Every lattice position is written in the reference's row-major
        overwrite order — wrap columns write their base column's render
        (bit-identical by cp equality).  Adjacent-column overlaps agree
        only to ~1e-5 (different absolute grid coordinates round
        differently), so preserving WHICH column wins each overlap is what
        keeps the dedup engine bit-identical to the full render.

        `patches`: (len(_render_idx), B, patch, patch, 3)."""
        plan = self.plan
        patch_sz = plan.geom.outfeat_sizes[-1]
        B = patches.shape[1]
        meta = jnp.zeros((B, plan.meta_h, plan.meta_w, 3), jnp.float32)
        for p in range(plan.num_patches):
            r, c_raw = int(plan.img_starts[p, 0]), int(plan.img_starts[p, 1])
            patch = patches[int(self._full_map[p])]
            c = c_raw % plan.meta_w if plan.close_loop else c_raw
            if c + patch_sz <= plan.meta_w:
                meta = jax.lax.dynamic_update_slice(meta, patch, (0, r, c, 0))
            else:  # wrapping write (reference _circular_assign_value_width)
                split = plan.meta_w - c
                meta = jax.lax.dynamic_update_slice(
                    meta, patch[:, :, :split], (0, r, c, 0))
                meta = jax.lax.dynamic_update_slice(
                    meta, patch[:, :, split:], (0, r, 0, 0))
        return meta

    # ---- SPMD: lattice sharded over a device mesh --------------------
    def make_sharded_generate(self, mesh, axis: str = "data"):
        """Compile a multi-device generator: the rendered patch lattice is
        sharded over the mesh under `shard_map` — each device renders ONLY its
        own subset of lattice positions (params/fields replicated, so no halo
        exchange is needed; see infer/halo.py for the >HBM width-sharded
        variant) — and the meta image is assembled ON DEVICE in the same
        compiled program (the scatter's collectives ride the ICI).  This is
        the SPMD scale-out path for inference: throughput scales with device
        count at fixed batch.

        Returns fn(params, gl, z_field, noises) -> meta (B, meta_h, meta_w, 3)
        jnp array (replicated).  Matches the single-device engine to float
        fusion noise (~1e-5; tests/test_engine_pallas.py,
        __graft_entry__.dryrun_multichip).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        plan = self.plan
        ndev = int(mesh.devices.size)
        chunk = self.patch_chunk
        ridx = self._render_idx
        P_r = len(ridx)

        # pad the rendered set so every device gets the same whole number of
        # chunks (duplicate renders of the last position; dropped after)
        per_dev = -(-P_r // ndev)
        per_dev = -(-per_dev // chunk) * chunk
        tot = per_dev * ndev
        pad_idx = np.concatenate([ridx, np.repeat(ridx[-1:], tot - P_r)])

        z_starts = jnp.asarray(plan.z_starts[pad_idx]).reshape(
            tot // chunk, chunk, 2)
        n_starts = [jnp.asarray(s[pad_idx]).reshape(tot // chunk, chunk, 2)
                    for s in plan.noise_starts]
        cp_all = jnp.asarray(
            plan.cp_scalars[pad_idx].astype(np.float32)).reshape(
            tot // chunk, chunk, 5)

        def body(zs, ns, cps, params, gl, z_field, noises):
            # per-device: zs/ns/cps hold this device's chunk rows
            return self._patches_from_starts(params, gl, z_field,
                                             list(noises), zs, ns, cps)

        sharded_body = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), [P(axis)] * len(n_starts), P(axis),
                      P(), P(), P(), [P()] * self._n_noise_fields()),
            out_specs=P(axis))

        def full(params, gl, z_field, noises):
            patches = sharded_body(z_starts, n_starts, cp_all,
                                   params, gl, z_field, noises)
            # drop the padding renders, assemble on device (replicated out)
            return self._scatter_jnp(patches[:P_r])

        return jax.jit(
            full, out_shardings=NamedSharding(mesh, P()))

    def _n_noise_fields(self) -> int:
        n = len(self.plan.noise_sizes)
        if not self.g.ss.disable_noise:
            n += len(self.g.ss.noise_sizes(self.plan.window))
        return n

    # ----------------------------------------------------------------
    def generate(self, params, key: jax.Array) -> jnp.ndarray:
        """One batch of meta images (B, meta_h, meta_w, 3)."""
        gl, z_field, noises = self.sample_fields(key)
        return self._generate(params, gl, z_field, noises)

    def generate_from_fields(self, params, gl, z_field, noises):
        return self._generate(params, gl, z_field, noises)

    def crop_to_target(self, meta: jnp.ndarray) -> jnp.ndarray:
        plan = self.plan
        ph = (plan.meta_h - plan.target_h) // 2
        pw = (plan.meta_w - plan.target_w) // 2
        return meta[:, ph:ph + plan.target_h, pw:pw + plan.target_w]
