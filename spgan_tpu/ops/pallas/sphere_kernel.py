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


def _kernel(y0_ref, y1_ref, wy_ref, sx_ref, fx_ref, x_ref, w_ref, o_ref,
            row_scratch, s_scratch, acc_scratch, *, H, W, M, K2, C, Cout):
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
        contrib = jnp.dot(st, w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_scratch[:] = contrib
        else:
            acc_scratch[:] = acc_scratch[:] + contrib
    o_ref[0] = acc_scratch[:].reshape(H, W, Cout).astype(o_ref.dtype)


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

    kern = functools.partial(_kernel, H=H, W=W, M=M, K2=K2, C=C, Cout=Cout)
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
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
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
