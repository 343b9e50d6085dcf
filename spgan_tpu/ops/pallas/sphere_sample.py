"""Pallas TPU kernel: spherical resample WITHOUT the conv — the trainable
counterpart of sphere_kernel.fused_sphere_conv.

Training cannot use the fused kernel (its stop_gradient wrapper would drop
the true weight gradients), but the expensive part of the training-time
sphere convs is the gather-based resample.  This kernel produces the sampled
taps in (B, K2, H, W, C) layout using the same per-row offset tables (no
gathers); the conv then runs as one einsum contraction over (tap, channel),
through which gradients flow exactly as in the XLA path, while the sample
itself keeps the reference's straight-through backward via the stop-gradient
surrogate (see ops/grid_sample.py).

Tap-major layout note: writing (B, 3H, 3W, C) would interleave lanes with
stride 3 (hostile); (B, K2, H, W, C) keeps every write a clean (W, C) row and
the consumer contraction is einsum('bthwc,tco->bhwo', taps, W9), which equals
the stride-3 conv over the interleaved map exactly.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgan_tpu.ops.pallas.vma import out_struct


def _kernel(y0_ref, y1_ref, wy_ref, sx_ref, fx_ref, x_ref, o_ref,
            row_scratch, *, H, W, M):
    t = pl.program_id(1)

    def row_body(r, _):
        y0 = y0_ref[0, r, t]
        y1 = y1_ref[0, r, t]
        wy = wy_ref[0, r, t]
        sx = sx_ref[0, r, t]
        fx = fx_ref[0, r, t]
        r0 = x_ref[0, y0]
        r1 = x_ref[0, y1]
        row_scratch[:, 0, :] = r0 * (1.0 - wy) + r1 * wy
        a = row_scratch[pl.ds(M + sx, W)][:, 0, :]
        b = row_scratch[pl.ds(M + sx + 1, W)][:, 0, :]
        o_ref[0, 0, r] = (a * (1.0 - fx) + b * fx).astype(o_ref.dtype)
        return 0

    if H <= 40:
        # static unroll (SS training sizes are <= 35): lets Mosaic pipeline
        # the next row's latency-bound dynamic loads past the current row's
        # scratch round-trip (measured on the grouped inference kernel:
        # -22..-30% at 23^2..35^2; see sphere_kernel._kernel_grouped)
        for r in range(H):
            row_body(r, 0)
    else:
        jax.lax.fori_loop(0, H, row_body, 0)


def sphere_sample_taps(x: jnp.ndarray, tables: dict,
                       margin: int = 6,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """x: (B,H,W,C); tables: per-sample (B,H,K2) offset arrays.
    Returns (B,K2,H,W,C) sampled taps (primal only, not differentiable —
    wrap with the straight-through surrogate)."""
    if interpret is None:
        import os

        interpret = (os.environ.get("SPGAN_PALLAS_INTERPRET") == "1"
                     or jax.default_backend() != "tpu")
    B, H, W, C = x.shape
    K2 = tables["y0"].shape[-1]
    M = margin
    xpad = jnp.pad(x, ((0, 0), (0, 0), (M, M), (0, 0)), mode="edge")
    Wp = W + 2 * M
    sx = jnp.clip(tables["sx"], -M, M - 1)

    kern = functools.partial(_kernel, H=H, W=W, M=M)
    spec_t = pl.BlockSpec((1, H, K2), lambda b, t: (b, 0, 0),
                          memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, K2),
        in_specs=[spec_t, spec_t, spec_t, spec_t, spec_t,
                  pl.BlockSpec((1, H, Wp, C), lambda b, t: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, H, W, C),
                               lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((B, K2, H, W, C), x.dtype, xpad,
                             *tables.values()),
        scratch_shapes=[pltpu.VMEM((Wp, 1, C), jnp.float32)],
        interpret=interpret,
    )(tables["y0"], tables["y1"], tables["wy"].astype(jnp.float32),
      sx, tables["fx"].astype(jnp.float32), xpad)
    return out


def st_sample_taps(z: jnp.ndarray, tables: dict) -> jnp.ndarray:
    """Straight-through tap sampler: forward == sphere_sample_taps; VJP w.r.t.
    z == 0.1 * mean over taps of the cotangent (identical to the reference's
    3x3 block-mean backward in the interleaved layout)."""
    k2 = tables["y0"].shape[-1]
    primal = sphere_sample_taps(
        jax.lax.stop_gradient(z),
        jax.tree_util.tree_map(jax.lax.stop_gradient, tables))
    lin = (0.1 / k2) * jnp.broadcast_to(
        z[:, None], (z.shape[0], k2) + z.shape[1:])
    return primal + lin - jax.lax.stop_gradient(lin)
