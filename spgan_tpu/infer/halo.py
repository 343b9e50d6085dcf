"""Width-sharded panorama inference with halo exchange — the SPMD path for
panoramas whose latent/noise fields exceed one device's memory.

This is the ring-communication analog sketched in SURVEY §5: the cylindrical
latent field is sharded by width across the mesh; each device renders its own
lattice columns and fetches only the SS padding ring (window - step = 29
latent columns with the shipped config) from its right neighbor via
`jax.lax.ppermute` around the ring.  Per-layer noise fields exchange their
own (outfeat_size - outfeat_step) halos.

Notes:
  * Only the `num_steps_w_min` base columns are computed.  The reference's
    two extra wrap columns produce bit-identical patches to base columns 0/1
    (tests/test_stitcher.py), so base-only assembly yields the same panorama.
  * Lattice columns need NOT divide the device count: non-divisible widths
    are padded with wrapped columns (equal shards), the device-0 halo send
    is offset to the true wrap position, and duplicates are dropped before
    assembly (bit-identity pinned in tests/test_halo_sharded.py).
  * Patches return sharded over the lattice dim; the meta image is assembled
    on host in the reference's row-major overwrite order.  (The folded and
    sharded engines scatter on device — engine.py — and are preferred when
    the fields fit; this path exists for fields that exceed one device.)
  * Rendering shares the engine's folded fast path (engine.render_chunk):
    Pallas sphere kernel + TS tap-table skip convs, same backend defaults
    as PanoramaEngine.  Build the callable ONCE via
    `make_width_sharded_generate` and call it per batch — the
    `generate_width_sharded` convenience wrapper memoizes the build, so
    repeated calls do not re-trace/re-jit the shard_map program.
"""
from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spgan_tpu.geometry.coords import CoordsPartial
from spgan_tpu.infer.stitcher import LatticePlan
from spgan_tpu.models.generator import Generator


def make_width_sharded_generate(g: Generator, plan: LatticePlan,
                                mesh: Mesh, batch: int,
                                grid_partial: float, axis: str = "data",
                                compute_dtype: str = "float32",
                                col_chunk: int = 1,
                                use_pallas: bool | None = None,
                                use_skip_tables: bool | None = None):
    """Build the width-sharded generator ONCE; returns
    `generate(params, key) -> np.ndarray` (B, meta_h, meta_w, 3).

    All static work — lattice metadata, tap-table margins, the shard_map
    body, and the jitted program — happens here; per-call work is only
    field sampling, the device dispatch, and host assembly.

    Rendering goes through the engine's shared folded body
    (engine.render_chunk): each render call computes `col_chunk` lattice
    columns x num_steps_h rows x batch panoramas at once, with the same
    Pallas sphere kernel / TS tap-table fast paths as the single-device
    engine (defaults follow the backend, like PanoramaEngine).

    Bit-identity across device counts: render groups are whole global
    columns aligned to multiples of `col_chunk`, and device boundaries are
    multiples of cols_per_dev — so as long as `col_chunk` divides
    cols_per_dev in every run being compared (always true for the default
    1), every position is rendered by an identical program on identical
    inputs regardless of the mesh size.
    """
    assert plan.close_loop, "width sharding targets closed-loop panoramas"
    ndev = int(mesh.devices.size)
    zx = plan.geom.latentspace_step
    win = plan.window
    nw = plan.num_steps_w_min
    nh = plan.num_steps_h
    # pad + drop (VERDICT r3 next-round #5): when the lattice columns do
    # not divide over the devices, the cylindrical fields are extended by
    # `pad` WRAPPED columns (copies of columns 0..pad-1 — bit-identical by
    # the close-loop wrap property) so every device holds an equal shard;
    # the duplicate patches are dropped before assembly.
    cols_per_dev = -(-nw // ndev)  # ceil
    nw_pad = cols_per_dev * ndev
    pad = nw_pad - nw
    shard_w = cols_per_dev * zx
    halo_z = win - zx
    # device 0 sends its halo from offset pad*zx (the TRUE columns that
    # follow the last device's padded shard), so both the halo and that
    # offset must fit inside one shard; and a padded column's window must
    # not cross the seam (its cp would need circular=True, which the
    # wrapped-index algebra below correctly produces only for base cols)
    assert pad * zx + halo_z <= shard_w, (
        f"shard width {shard_w} latent cols < halo {halo_z} + wrap offset "
        f"{pad * zx}; use a wider panorama or fewer devices")
    assert pad * zx + win <= plan.y_total, (pad, win, plan.y_total)

    out_sizes = plan.geom.outfeat_sizes
    out_steps = plan.geom.outfeat_steps
    # per-layer noise-field halos must satisfy the same bound as the latent
    # one (dynamic_slice clamps silently, which would corrupt, not crash)
    for _osz, _ostep in zip(out_sizes, out_steps):
        assert pad * _ostep + (_osz - _ostep) <= cols_per_dev * _ostep, (
            f"noise level size {_osz} step {_ostep}: halo {_osz - _ostep} + "
            f"wrap offset {pad * _ostep} exceeds shard width "
            f"{cols_per_dev * _ostep}; use a wider panorama or fewer devices")
    patch_sz = out_sizes[-1]
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_skip_tables is None:
        use_skip_tables = bool(use_pallas)
    assert cols_per_dev % col_chunk == 0, (
        f"col_chunk {col_chunk} must divide cols_per_dev {cols_per_dev} "
        f"(and divide it in every run being compared for bit-identity)")

    # ---- static field geometry + shardings ----------------------------
    coords_field = jnp.asarray(
        g.ss.coord_grid.test_field(plan.z_field_h, plan.z_field_w))
    if pad:
        coords_field = jnp.concatenate(
            [coords_field, coords_field[:, :pad * zx]], axis=1)
    shard = NamedSharding(mesh, P(None, None, axis))
    repl = NamedSharding(mesh, P())
    coords_field = jax.device_put(coords_field,
                                  NamedSharding(mesh, P(None, axis)))
    n_noise = len(plan.noise_sizes)

    _, _, i2j = g.ts.plan()
    skip_sizes = [out_sizes[src - 2] for src in sorted(i2j)]

    # ---- static per-position metadata (host-side) ----------------------
    # cp scalars for every global column, device-major / column-major /
    # row-minor — the same test-mode algebra the old in-graph computation
    # used (x parts in f64-then-f32 like the engine's stitcher, y parts in
    # f32 like the traced zy_st path); padded columns (jg >= nw) normalize
    # to their base column's cp by the mod-wrap rule.
    chunk = col_chunk * nh
    n_chunks = cols_per_dev // col_chunk
    yt32 = np.float32(plan.y_total)
    cps_host = np.zeros((ndev, n_chunks, chunk, 5), np.float32)
    for jg in range(nw_pad):
        dev, jl = divmod(jg, cols_per_dev)
        q, jc = divmod(jl, col_chunk)
        zy_raw = jg * zx
        circ = np.float32(zy_raw + win > plan.y_total
                          and zy_raw < plan.y_total)
        zy = np.float32(zy_raw % plan.y_total if zy_raw >= plan.y_total
                        else zy_raw)
        p_y_st = zy / yt32
        p_y_ed = (zy + np.float32(win + 1)) / yt32
        for i in range(nh):
            zr = i * zx
            cps_host[dev, q, jc * nh + i] = (
                np.float32(zr / plan.x_total),
                np.float32((zr + win + 1) / plan.x_total),
                p_y_st, p_y_ed, circ)
    cps_sharded = jax.device_put(
        jnp.asarray(cps_host.reshape(ndev * n_chunks, chunk, 5)),
        NamedSharding(mesh, P(axis)))

    # local slice starts: identical on every device (column-major fold)
    zs_host = np.zeros((n_chunks, chunk, 2), np.int32)
    ns_host = [np.zeros((n_chunks, chunk, 2), np.int32) for _ in out_steps]
    for q in range(n_chunks):
        for jc in range(col_chunk):
            jl = q * col_chunk + jc
            for i in range(nh):
                zs_host[q, jc * nh + i] = (i * zx, jl * zx)
                for li, ostep in enumerate(out_steps):
                    ns_host[li][q, jc * nh + i] = (i * ostep, jl * ostep)

    # exact tap-table shift margins from the full static cp set (the same
    # plan-time derivation as PanoramaEngine.__post_init__)
    skip_margins = None
    if use_skip_tables:
        from spgan_tpu.geometry.sphere_grid import sphere_offset_tables_batch

        flat = cps_host.reshape(-1, 5)
        cp_all = CoordsPartial(
            p_x_st=jnp.asarray(flat[:, 0]), p_x_ed=jnp.asarray(flat[:, 1]),
            p_y_st=jnp.asarray(flat[:, 2]), p_y_ed=jnp.asarray(flat[:, 3]),
            circular=jnp.asarray(flat[:, 4]),
            x_total=plan.x_total, y_total=plan.y_total,
            grid_partial=grid_partial, test_flag=True)
        skip_margins = []
        for s in skip_sizes:
            t = sphere_offset_tables_batch(cp_all, s, s)
            mx = int(np.abs(np.asarray(t["sx"])).max())
            skip_margins.append(max(6, mx + 1))

    from spgan_tpu.infer.engine import render_chunk

    def body(params, gl, z_local, coords_local, cps_local, *noises_local):
        """Per-device: halo-exchange, render this shard's lattice columns."""
        dev = jax.lax.axis_index(axis)
        right = functools.partial(
            jax.lax.ppermute, axis_name=axis,
            perm=[(i, (i - 1) % ndev) for i in range(ndev)])

        def halo_from_right(arr, width, axis_dim, wrap_off):
            # each device SENDS the slice its left neighbor needs.  With
            # padding, the last device's halo is not device 0's shard
            # start but the TRUE columns at offset pad*step (the columns
            # following the padded field end, mod the circle) — so device
            # 0 sends from `wrap_off`, everyone else from 0.
            off = jnp.where(dev == 0, wrap_off, 0)
            sl = jax.lax.dynamic_slice_in_dim(arr, off, width, axis=axis_dim)
            return right(sl)

        # SS padding ring from the right neighbor (circular)
        z_halo = halo_from_right(z_local, halo_z, 2, pad * zx)
        z_ext = jnp.concatenate([z_local, z_halo], axis=2)
        c_halo = halo_from_right(coords_local, halo_z, 1, pad * zx)
        c_ext = jnp.concatenate([coords_local, c_halo], axis=1)
        n_ext = []
        for n, osz, ostep in zip(noises_local, out_sizes, out_steps):
            h = halo_from_right(n, osz - ostep, 2, pad * ostep)
            n_ext.append(jnp.concatenate([n, h], axis=2))

        styles = g.build_styles(params, gl, None)
        gz = gl[:, 0]
        zs_arr = jnp.asarray(zs_host)
        ns_arr = [jnp.asarray(a) for a in ns_host]

        def gen_chunk(args):
            zs, ns, cpc = args
            return render_chunk(
                g, params, styles, gz, None, z_ext, c_ext, n_ext,
                zs, ns, cpc, batch=batch, chunk=chunk, win=win,
                out_sizes=out_sizes, x_total=plan.x_total,
                y_total=plan.y_total, grid_partial=grid_partial, cdt=cdt,
                use_pallas=use_pallas, skip_sizes=skip_sizes,
                use_skip_tables=use_skip_tables, skip_margins=skip_margins)

        patches = jax.lax.map(gen_chunk, (zs_arr, ns_arr, cps_local))
        return patches.reshape(n_chunks * chunk, batch, patch_sz,
                               patch_sz, 3).astype(jnp.float32)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, None, axis), P(None, axis), P(axis))
        + tuple(P(None, None, axis) for _ in range(n_noise)),
        out_specs=P(axis))

    def full(params, key):
        # field sampling lives INSIDE the one jitted program: a remote-
        # attached runtime pays round-trip latency per dispatch, so the
        # ~12 eager RNG calls + device_puts this replaces cost more than
        # the render itself at small widths (measured 2.6 -> 13.7 panos/s)
        kg, kz, kn = jax.random.split(key, 3)
        gl = jax.random.normal(kg, (batch, 2, g.ts.global_dim))
        gl = gl.at[:, 1].set(gl[:, 0])
        z_field = jax.random.normal(
            kz, (batch, plan.z_field_h, plan.z_field_w, g.ts.local_dim))
        noises = [jax.random.normal(jax.random.fold_in(kn, i),
                                    (batch, h, w, 1))
                  for i, (h, w) in enumerate(plan.noise_sizes)]
        if pad:
            # extend every cylindrical field with wrap copies of its start
            # so the padded lattice columns reproduce base columns 0..pad-1
            z_field = jnp.concatenate([z_field, z_field[:, :, :pad * zx]],
                                      axis=2)
            noises = [jnp.concatenate([n, n[:, :, :pad * ostep]], axis=2)
                      for n, ostep in zip(noises, out_steps)]
        z_field = jax.lax.with_sharding_constraint(z_field, shard)
        noises = [jax.lax.with_sharding_constraint(n, shard)
                  for n in noises]
        gl = jax.lax.with_sharding_constraint(gl, repl)
        patches = fn(params, gl, z_field, coords_field, cps_sharded,
                     *noises)

        # ---- on-device assembly (same program; no host round-trip) -----
        # reorder (dev, jl, i) -> row-major (i, j_global), then drop the
        # padded wrap columns (duplicates of base columns 0..pad-1)
        patches = patches.reshape(ndev, cols_per_dev, nh, batch,
                                  patch_sz, patch_sz, 3)
        patches = patches.transpose(2, 0, 1, 3, 4, 5, 6).reshape(
            nh, nw_pad, batch, patch_sz, patch_sz, 3)
        patches = patches[:, :nw]

        # reference overwrite order over base columns (row-major; the last
        # columns' wrapping writes overwrite the row start, exactly as the
        # reference's _circular_assign_value_width does)
        meta = jnp.zeros((batch, plan.meta_h, plan.meta_w, 3), jnp.float32)
        px = plan.geom.pixelspace_step
        for i in range(nh):
            for j in range(nw):
                r, c = i * px, j * px
                patch = patches[i, j]
                if c + patch_sz <= plan.meta_w:
                    meta = jax.lax.dynamic_update_slice(
                        meta, patch, (0, r, c, 0))
                else:
                    split = plan.meta_w - c
                    meta = jax.lax.dynamic_update_slice(
                        meta, patch[:, :, :split], (0, r, c, 0))
                    meta = jax.lax.dynamic_update_slice(
                        meta, patch[:, :, split:], (0, r, 0, 0))
        # the meta stays width-sharded: this path exists for fields (and
        # panoramas) larger than one device's HBM
        return jax.lax.with_sharding_constraint(
            meta, NamedSharding(mesh, P(None, None, axis)))

    jfull = jax.jit(full)  # built once; every generate() call reuses it

    def generate(params, key: jax.Array) -> jax.Array:
        """Returns the meta image (B, meta_h, meta_w, 3) as a DEVICE array
        sharded by width; jax.device_get it for numpy."""
        return jfull(params, key)

    return generate


# build-once memo for the convenience wrapper.  Keys use object ids; the
# cached closures hold strong references to (g, plan, mesh), so a live cache
# entry pins its key objects and ids cannot be recycled underneath it.
_BUILD_CACHE: dict = {}


def generate_width_sharded(g: Generator, params, plan: LatticePlan,
                           mesh: Mesh, key: jax.Array, batch: int,
                           grid_partial: float, axis: str = "data",
                           compute_dtype: str = "float32",
                           col_chunk: int = 1,
                           use_pallas: bool | None = None,
                           use_skip_tables: bool | None = None) -> np.ndarray:
    """One-call convenience over `make_width_sharded_generate`: returns the
    meta image (B, meta_h, meta_w, 3) as numpy.  The built program is
    memoized on the static configuration, so calling this per batch costs
    one dispatch, not a re-trace."""
    ck = (id(g), id(plan), id(mesh), batch, float(grid_partial), axis,
          compute_dtype, col_chunk, use_pallas, use_skip_tables)
    gen = _BUILD_CACHE.get(ck)
    if gen is None:
        gen = _BUILD_CACHE[ck] = make_width_sharded_generate(
            g, plan, mesh, batch, grid_partial, axis=axis,
            compute_dtype=compute_dtype, col_chunk=col_chunk,
            use_pallas=use_pallas, use_skip_tables=use_skip_tables)
    return np.asarray(jax.device_get(gen(params, key)))
