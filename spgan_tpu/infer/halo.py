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
  * Sampling uses the grid path (no tap-table/Pallas variants here yet);
    see ops/pallas/sphere_kernel.py for the single-device fast paths.
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


def generate_width_sharded(g: Generator, params, plan: LatticePlan,
                           mesh: Mesh, key: jax.Array, batch: int,
                           grid_partial: float, axis: str = "data",
                           compute_dtype: str = "float32") -> np.ndarray:
    """Returns the meta image (B, meta_h, meta_w, 3) as numpy."""
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

    # ---- fields (globally sampled, then sharded by width) -------------
    kg, kz, kn = jax.random.split(key, 3)
    gl = jax.random.normal(kg, (batch, 2, g.ts.global_dim))
    gl = gl.at[:, 1].set(gl[:, 0])
    z_field = jax.random.normal(
        kz, (batch, plan.z_field_h, plan.z_field_w, g.ts.local_dim))
    noises = [jax.random.normal(jax.random.fold_in(kn, i),
                                (batch, h, w, 1))
              for i, (h, w) in enumerate(plan.noise_sizes)]
    coords_field = jnp.asarray(
        g.ss.coord_grid.test_field(plan.z_field_h, plan.z_field_w))

    if pad:
        # extend every cylindrical field with wrap copies of its start so
        # the padded lattice columns reproduce base columns 0..pad-1
        z_field = jnp.concatenate([z_field, z_field[:, :, :pad * zx]],
                                  axis=2)
        noises = [jnp.concatenate([n, n[:, :, :pad * ostep]], axis=2)
                  for n, ostep in zip(noises, out_steps)]
        coords_field = jnp.concatenate(
            [coords_field, coords_field[:, :pad * zx]], axis=1)

    shard = NamedSharding(mesh, P(None, None, axis))
    z_field = jax.device_put(z_field, shard)
    noises = [jax.device_put(n, shard) for n in noises]
    repl = NamedSharding(mesh, P())
    gl = jax.device_put(gl, repl)
    coords_field = jax.device_put(coords_field,
                                  NamedSharding(mesh, P(None, axis)))

    ss_sizes = g.ss.layer_sizes(win)
    _, _, i2j = g.ts.plan()
    skip_sizes = [out_sizes[src - 2] for src in sorted(i2j)]

    def body(params, gl, z_local, coords_local, *noises_local):
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

        def gen_one(pos, _):
            i = pos // cols_per_dev
            jl = pos % cols_per_dev
            zr = i * zx
            zc = jl * zx
            zw = jax.lax.dynamic_slice(
                z_ext, (0, zr, zc, 0), (batch, win, win, g.ts.local_dim))
            cw = jax.lax.dynamic_slice(
                c_ext, (zr, zc, 0), (win, win, c_ext.shape[-1]))
            cw = jnp.broadcast_to(cw[None], (batch,) + cw.shape)
            lns = []
            for n, osz, ostep in zip(n_ext, out_sizes, out_steps):
                lns.append(jax.lax.dynamic_slice(
                    n, (0, i * ostep, jl * ostep, 0), (batch, osz, osz, 1)))

            # coords_partial from the GLOBAL column index
            jg = dev * cols_per_dev + jl
            zy_st_raw = jg * zx
            zy_ed = zy_st_raw + win
            circ = jnp.logical_and(zy_ed > plan.y_total,
                                   zy_st_raw < plan.y_total)
            zy_st = jnp.where(
                jnp.logical_and(zy_ed > plan.y_total,
                                zy_st_raw >= plan.y_total),
                zy_st_raw % plan.y_total, zy_st_raw).astype(jnp.float32)
            size1 = win + 1
            ones = jnp.ones((batch,), jnp.float32)
            cp = CoordsPartial(
                p_x_st=ones * (zr / plan.x_total),
                p_x_ed=ones * ((zr + size1) / plan.x_total),
                p_y_st=ones * (zy_st / plan.y_total),
                p_y_ed=ones * ((zy_st + size1) / plan.y_total),
                circular=ones * circ.astype(jnp.float32),
                x_total=plan.x_total, y_total=plan.y_total,
                grid_partial=grid_partial, test_flag=True)
            from spgan_tpu.geometry.sphere_grid import sphere_patch_grid_batch

            ss_grids = [sphere_patch_grid_batch(cp, s, s)[:1]
                        for s in ss_sizes]
            skip_grids = [sphere_patch_grid_batch(cp, s, s)[:1]
                          for s in skip_sizes]
            structure = g.ss.apply(params["ss"], gz.astype(cdt),
                                   zw.astype(cdt), cw.astype(cdt), cp,
                                   grids=ss_grids, grid_groups=1)
            img = g.ts.synthesize(params["ts"], structure,
                                  styles.astype(cdt), cp,
                                  noises=[n.astype(cdt) for n in lns],
                                  skip_grids=skip_grids, grid_groups=1)
            return pos + 1, img.astype(jnp.float32)

        n_local = nh * cols_per_dev
        _, patches = jax.lax.scan(gen_one, 0, None, length=n_local)
        return patches  # (n_local, B, P, P, 3)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, None, axis), P(None, axis))
        + tuple(P(None, None, axis) for _ in noises),
        out_specs=P(axis))
    patches = jax.jit(fn)(params, gl, z_field, coords_field, *noises)
    patches = jax.device_get(patches)  # (nh*nw ordered dev-major)

    # reorder device-major (dev, i, jl) -> row-major (i, j_global), then
    # drop the padded wrap columns (duplicates of base columns 0..pad-1)
    patches = patches.reshape(ndev, nh, cols_per_dev, batch,
                              patch_sz, patch_sz, 3)
    patches = patches.transpose(1, 0, 2, 3, 4, 5, 6).reshape(
        nh, nw_pad, batch, patch_sz, patch_sz, 3)
    patches = patches[:, :nw].reshape(nh * nw, batch,
                                      patch_sz, patch_sz, 3)

    # host assembly, reference overwrite order over base columns
    meta = np.zeros((batch, plan.meta_h, plan.meta_w, 3), np.float32)
    px = plan.geom.pixelspace_step
    for idx in range(nh * nw):
        i, j = divmod(idx, nw)
        r, c = i * px, j * px
        patch = patches[idx]
        if c + patch_sz <= plan.meta_w:
            meta[:, r:r + patch_sz, c:c + patch_sz] = patch
        else:
            split = plan.meta_w - c
            meta[:, r:r + patch_sz, c:] = patch[:, :, :split]
            meta[:, r:r + patch_sz, :patch_sz - split] = patch[:, :, split:]
    return meta
