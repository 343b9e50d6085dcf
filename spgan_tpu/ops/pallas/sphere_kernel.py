"""Pallas TPU kernel: fused spherical resample + stride-k conv.

This is the TPU-native replacement for the reference's hot path — on GPU the
reference does `F.grid_sample` to a (3H, 3W) map then a stride-3 conv
(models/spgan_ops_gs.py:756-816); as plain XLA that lowers to 4 large gathers
per sphere conv (the dominant inference cost).

The kernel exploits the structural decomposition of the gnomonic patch grid
(see geometry/sphere_grid.sphere_offset_tables): every output row r, tap t
samples the input at (r + dy(r,t), c + dx(r,t)) — a *uniform translation per
row*.  So instead of gathers it does, per sample:

  for tap t:                     (9, static unroll)
    for output row r:            (fori loop)
      mix two input rows (bilinear in y, dynamic first-dim index)
      two dynamic column slices of the edge-padded row (bilinear in x)
    one (H*W, C) @ (C, Cout) MXU matmul, accumulated over taps

Inputs are edge-padded in x by `margin` columns so the per-row dynamic slice
reproduces border-clamped bilinear sampling exactly.

Used in the inference engine (forward only).  Training keeps the XLA path:
the straight-through gradient trick would lose the true weight gradients
through a stop_gradient'ed fused op.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgan_tpu.ops.pallas.vma import out_struct


def _kernel(y0_ref, y1_ref, wy_ref, sx_ref, fx_ref, x_ref, w_ref, o_ref,
            row_scratch, s_scratch, acc_scratch, *, H, W, M, K2, C, Cout,
            mxu_bf16):
    # refs (leading block dim of 1 squeezed by indexing [0])
    for t in range(K2):  # static unroll over taps
        def row_body(r, _):
            y0 = y0_ref[0, r, t]
            y1 = y1_ref[0, r, t]
            wy = wy_ref[0, r, t]
            sx = sx_ref[0, r, t]
            fx = fx_ref[0, r, t]
            r0 = x_ref[0, y0]          # (Wp, C)
            r1 = x_ref[0, y1]
            # mix rows, stage into a (Wp, 1, C) ref: the shifted dim is the
            # UNTILED leading dim, where Mosaic allows arbitrary dynamic
            # slices (the sublane dim would demand 8-aligned starts)
            row_scratch[:, 0, :] = r0 * (1.0 - wy) + r1 * wy
            a = row_scratch[pl.ds(M + sx, W)][:, 0, :]
            b = row_scratch[pl.ds(M + sx + 1, W)][:, 0, :]
            s_scratch[r] = a * (1.0 - fx) + b * fx
            return 0

        jax.lax.fori_loop(0, H, row_body, 0)
        st = s_scratch[:].reshape(H * W, C)
        if mxu_bf16:
            # bf16 inputs: round the staged taps back to bf16 so the MXU
            # runs single-pass (the f32 staging exists only because Mosaic
            # cannot shape-cast bf16 tiles).  This APPROXIMATES the XLA tap
            # path (taps rounded to bf16 entering the MXU), not bit parity:
            # XLA lerps in bf16 and accumulates per-tap contributions in
            # bf16, while this kernel lerps in f32, rounds once, and
            # accumulates taps in f32 — strictly less rounding error.
            st = st.astype(jnp.bfloat16)
        contrib = jnp.dot(st, w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_scratch[:] = contrib
        else:
            acc_scratch[:] = acc_scratch[:] + contrib
    o_ref[0] = acc_scratch[:].reshape(H, W, Cout).astype(o_ref.dtype)


def _kernel_grouped(y0_ref, y1_ref, wy_ref, sx_ref, fx_ref, x_ref, w_ref,
                    o_ref, row_scratch, s_scratch, acc_scratch,
                    *, H, Hb, W, M, K2, C, Cout, mxu_bf16):
    hb = pl.program_id(1)
    Bg = row_scratch.shape[1]
    for t in range(K2):  # static unroll over taps
        def row_body(r, _):
            rg = jnp.minimum(hb * Hb + r, H - 1)  # clamp padded tail rows
            y0 = y0_ref[0, rg, t]
            y1 = y1_ref[0, rg, t]
            wy = wy_ref[0, rg, t]
            sx = sx_ref[0, rg, t]
            fx = fx_ref[0, rg, t]
            r0 = x_ref[0, y0]          # (Wp, Bg, C)
            r1 = x_ref[0, y1]
            row_scratch[:] = r0 * (1.0 - wy) + r1 * wy
            a = row_scratch[pl.ds(M + sx, W)]
            b = row_scratch[pl.ds(M + sx + 1, W)]
            s_scratch[pl.ds(r * W, W)] = a * (1.0 - fx) + b * fx
            return 0

        # static unroll: the row ops are independent (distinct s_scratch
        # slices), so unrolling lets Mosaic overlap the latency-bound
        # dynamic row loads instead of serializing Hb loop trips
        for r in range(Hb):
            row_body(r, 0)
        # (Hb*W, Bg, C) -> (Hb*W*Bg, C): Bg == the f32 sublane tile (8), so
        # collapsing the untiled leading dims into it is a physical no-op
        st = s_scratch[:].reshape(Hb * W * Bg, C)
        if mxu_bf16:
            st = st.astype(jnp.bfloat16)  # single-pass MXU (see _kernel)
        contrib = jnp.dot(st, w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_scratch[:] = contrib
        else:
            acc_scratch[:] = acc_scratch[:] + contrib
    o_ref[0] = acc_scratch[:].reshape(Hb, W, Bg, Cout).astype(o_ref.dtype)


def fused_sphere_conv_grouped(x: jnp.ndarray, tables: dict, w9: jnp.ndarray,
                              groups: int, margin: int = 6,
                              interpret: Optional[bool] = None) -> jnp.ndarray:
    """Grouped variant of fused_sphere_conv for the lattice engine, where
    consecutive samples share one offset table (all panoramas of a batch at
    the same lattice position).  x: (B,H,W,C) with B = groups * Bg; tables:
    dict of (groups, H, K2).  Requires Bg % 8 == 0 (the f32 sublane tile —
    the in-kernel (Hb*W, Bg, C) -> (Hb*W*Bg, C) collapse is layout-exact
    only then); callers fall back to fused_sphere_conv otherwise.

    Why: the per-sample kernel's cost is dominated by the serial per-row
    loop (measured 6.45 ms at H=35, B=64 vs ~1.4 ms of math).  Grouping
    turns each row op into a (Wp, Bg, C) vector op and cuts the trip count
    by Bg, and the tap matmul becomes one (Hb*W*Bg, C) @ (C, Cout) MXU call.
    """
    if interpret is None:
        import os

        interpret = (os.environ.get("SPGAN_PALLAS_INTERPRET") == "1"
                     or jax.default_backend() != "tpu")
    B, H, W, C = x.shape
    K2, _, Cout = w9.shape
    G = groups
    assert B % G == 0, (B, G)
    Bg = B // G
    assert Bg % 8 == 0, f"group size {Bg} must be a multiple of 8"
    if Bg > 8:
        # normalize to Bg=8 subgroups (the x block alone is H*Wp*Bg*C*2
        # bytes — 13.5 MB at Bg=16 for the 35^2 layer)
        sub = Bg // 8
        tables = {k: jnp.repeat(v, sub, axis=0) for k, v in tables.items()}
        G, Bg = G * sub, 8
    M = margin

    # VMEM budget: in/out blocks are double-buffered across grid steps.
    # When over ~14 MB, split the contraction dim — the kernel is linear in
    # (x, w) over C, so summing per-half outputs is exact up to one extra
    # f32 add per element.
    Hb_est = min(8, H)
    Wp_est = W + 2 * M
    mxu_bf16 = x.dtype == jnp.bfloat16 and w9.dtype == jnp.bfloat16
    vmem = (2 * H * Wp_est * Bg * C * x.dtype.itemsize
            + 2 * Hb_est * W * Bg * Cout * x.dtype.itemsize
            + 4 * (Wp_est * Bg * C + Hb_est * W * Bg * C
                   + Hb_est * W * Bg * Cout)
            + 2 * K2 * C * Cout * w9.dtype.itemsize
            # the in-kernel bf16 round of the staged taps materializes one
            # extra (Hb*W*Bg, C) bf16 temporary before each MXU call
            + (2 * Hb_est * W * Bg * C if mxu_bf16 else 0))
    if vmem > 14 * 1024 * 1024 and C % 2 == 0 and C // 2 >= 128:
        half = C // 2
        return (fused_sphere_conv_grouped(
                    x[..., :half], {k: v for k, v in tables.items()},
                    w9[:, :half], G, margin, interpret)
                + fused_sphere_conv_grouped(
                    x[..., half:], {k: v for k, v in tables.items()},
                    w9[:, half:], G, margin, interpret))
    if vmem > 14 * 1024 * 1024:
        # over budget but not cleanly splittable: splitting below 128
        # channels pads the lane dim back to 128 in every VMEM buffer
        # (observed on-device: f32 at C=64 still OOMs at 16.36M), so
        # narrow/f32 cases use the per-sample kernel instead — its blocks
        # are Bg times smaller and always fit
        rep = {k: jnp.repeat(v, Bg, axis=0) for k, v in tables.items()}
        return fused_sphere_conv(x, rep, w9, margin, interpret)
    # (B,H,W,C) -> (G, H, Wp, Bg, C): Bg on the sublane dim, W untiled
    xg = x.reshape(G, Bg, H, W, C).transpose(0, 2, 3, 1, 4)
    xg = jnp.pad(xg, ((0, 0), (0, 0), (M, M), (0, 0), (0, 0)), mode="edge")
    Wp = W + 2 * M

    sx = jnp.clip(tables["sx"], -M, M - 1)
    Hb = min(8, H)
    n_hb = (H + Hb - 1) // Hb
    Hpad = n_hb * Hb

    kern = functools.partial(
        _kernel_grouped, H=H, Hb=Hb, W=W, M=M, K2=K2, C=C, Cout=Cout,
        mxu_bf16=(x.dtype == jnp.bfloat16 and w9.dtype == jnp.bfloat16))
    spec_t = pl.BlockSpec((1, H, K2), lambda g, h: (g, 0, 0),
                          memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=(G, n_hb),
        in_specs=[spec_t, spec_t, spec_t, spec_t, spec_t,
                  pl.BlockSpec((1, H, Wp, Bg, C), lambda g, h: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K2, C, Cout), lambda g, h: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Hb, W, Bg, Cout),
                               lambda g, h: (g, h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((G, Hpad, W, Bg, Cout), x.dtype, xg, w9,
                             *tables.values()),
        scratch_shapes=[
            pltpu.VMEM((Wp, Bg, C), jnp.float32),
            pltpu.VMEM((Hb * W, Bg, C), jnp.float32),
            pltpu.VMEM((Hb * W * Bg, Cout), jnp.float32),
        ],
        interpret=interpret,
    )(tables["y0"], tables["y1"], tables["wy"].astype(jnp.float32),
      sx, tables["fx"].astype(jnp.float32), xg, w9)
    out = out[:, :H]  # drop the padded tail rows
    return out.transpose(0, 3, 1, 2, 4).reshape(B, H, W, Cout)


def fused_sphere_conv(x: jnp.ndarray, tables: dict, w9: jnp.ndarray,
                      margin: int = 6,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """x: (B,H,W,C) [pre-scaled by the per-sample style]; tables: dict of
    (B,H,K2) arrays from sphere_offset_tables (per sample); w9: (K2,C,Cout)
    [pre-scaled shared weight].  Returns (B,H,W,Cout) before demodulation.
    """
    if interpret is None:
        import os

        interpret = (os.environ.get("SPGAN_PALLAS_INTERPRET") == "1"
                     or jax.default_backend() != "tpu")
    B, H, W, C = x.shape
    K2, _, Cout = w9.shape
    M = margin
    xpad = jnp.pad(x, ((0, 0), (0, 0), (M, M), (0, 0)), mode="edge")
    Wp = W + 2 * M

    # clamp shifts into the padded range (shifts beyond the margin would be
    # out of bounds; geometrically |dx| << margin for real configs)
    sx = jnp.clip(tables["sx"], -M, M - 1)

    kern = functools.partial(
        _kernel, H=H, W=W, M=M, K2=K2, C=C, Cout=Cout,
        mxu_bf16=(x.dtype == jnp.bfloat16 and w9.dtype == jnp.bfloat16))
    grid = (B,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, K2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),      # y0
            pl.BlockSpec((1, H, K2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),      # y1
            pl.BlockSpec((1, H, K2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),      # wy
            pl.BlockSpec((1, H, K2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),      # sx
            pl.BlockSpec((1, H, K2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),      # fx
            pl.BlockSpec((1, H, Wp, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((K2, C, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),      # w
        ],
        out_specs=pl.BlockSpec((1, H, W, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((B, H, W, Cout), x.dtype, xpad, w9,
                             *tables.values()),
        scratch_shapes=[
            # f32 staging: mixed bf16*f32 row math promotes to f32, and
            # Mosaic cannot shape-cast (H,W,C)->(H*W,C) on bf16 tiles
            pltpu.VMEM((Wp, 1, C), jnp.float32),
            pltpu.VMEM((H, W, C), jnp.float32),
            pltpu.VMEM((H * W, Cout), jnp.float32),
        ],
        interpret=interpret,
    )(tables["y0"], tables["y1"], tables["wy"].astype(jnp.float32),
      sx, tables["fx"].astype(jnp.float32), xpad, w9)
    return out
