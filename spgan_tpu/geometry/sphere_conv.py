"""Spherical convolutions: grid-resample to (3H, 3W) + stride-3 conv.

Behavioral parity targets (reference file:line):
  * SS sphere styled conv: models/spgan_ops_gs.py:ModulatedConv2d.forward
    deal_coords path (:756-816) — grid-sample input AND raw coords with the
    straight-through sampler, re-encode coords (tanh/cos/sin), concat, then a
    per-sample modulated conv with stride == kernel_size.  Weight is
    identity-initialized (center tap 1 for every in/out pair, :374-383).
  * TS skip sphere conv: models/spherenet/sphere_conv2d.py:
    SphereConvBatchDiffFixBorderGNoGrad (:124-205) — plain (non-modulated)
    conv, identity init, weight scaled by 1/sqrt(fan_in), default-init bias,
    LeakyReLU(0.01).

TPU-native notes: sampling input+coords is ONE fused gather over the
concatenated channels (sampling is channel-wise, so sample(concat) ==
concat(sample)); encoding happens after sampling exactly as the reference
does.  Grids come from the vectorized generator (sphere_grid.py) — in-graph,
never on the host.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from spgan_tpu.geometry.coords import CoordsPartial, encode_coords
from spgan_tpu.geometry.sphere_grid import sphere_patch_grid_batch
from spgan_tpu.ops.grid_sample import st_grid_sample_3x3
from spgan_tpu.ops.modulated import ModulatedConv2d


def _conv_stride_k(x, w, k):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(k, k), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@dataclass(frozen=True)
class SphereStyledConv:
    """The SS "SphereConditionalBlock" conv: deal_coords modulated sphere conv.

    in_ch counts the coord channels (local_dim + coord_dim), matching the
    reference where the identity-init weight and the modulation span the
    concatenated channels (models/spgan/spgan.py:135-154).

    DELIBERATE DIVERGENCE (documented, tested): for batch > 1 the reference's
    deal_coords path concatenates (1, B*local) sampled latents with (1, B*3)
    encoded coords and runs a groups=B conv (spgan_ops_gs.py:791-814) — the
    group boundaries then cross sample boundaries, so each sample's "coord"
    input slots actually receive the *next sample's* latent channels and
    outputs depend on batch composition.  This implementation computes the
    intended per-sample semantics ([own latents, own coords] per group),
    which coincide with the reference exactly at batch 1 (verified
    end-to-end by tests/test_reference_forward_parity.py)."""

    local_dim: int
    coord_dim: int
    out_ch: int
    style_dim: int
    kernel_size: int = 3

    @property
    def in_ch(self) -> int:
        return self.local_dim + self.coord_dim

    def conv_spec(self) -> ModulatedConv2d:
        return ModulatedConv2d(
            in_ch=self.in_ch, out_ch=self.out_ch,
            kernel_size=self.kernel_size, style_dim=self.style_dim,
            demodulate=True, no_zero_pad=True, identity_init=True)

    def init(self, key: jax.Array) -> dict:
        return {"conv": self.conv_spec().init(key)}

    def apply(self, params: dict, x: jnp.ndarray, style: jnp.ndarray,
              coords: jnp.ndarray, cp: CoordsPartial,
              grid: Optional[jnp.ndarray] = None,
              grid_groups: int = 0,
              tables: Optional[dict] = None,
              tables_mode: str = "fused",
              tables_groups: int = 0) -> jnp.ndarray:
        """x: (B,H,W,local_dim); coords: (B,H,W,coord_dim) RAW indices;
        style: (B,style_dim). Output: (B,H,W,out_ch) — size preserving
        (stride == kernel over the k-times-resampled map).

        grid_groups>0: `grid` is (G, 3H, 3W, 2), shared by B//G samples each
        (fast batch-shared gather — see ops/grid_sample.py).
        tables: per-sample row-offset tables. tables_mode="fused" uses the
        fused Pallas conv kernel (forward-only; inference); "sample" uses the
        tap sampler kernel + an einsum contraction, through which weight and
        style gradients flow exactly (training path)."""
        b, h, w, _ = x.shape
        k = self.kernel_size
        need_grid = tables is None or tables_mode != "sample"
        if grid is None and need_grid:
            grid = sphere_patch_grid_batch(cp, h, w, k)
        spec = self.conv_spec()
        s = spec.style_scale(params["conv"], style)  # (B,in_ch)
        wt = params["conv"]["weight"].astype(x.dtype) * spec.scale
        demod = spec.demod_factors(params["conv"], s).astype(x.dtype)
        s = s.astype(x.dtype)

        if tables is not None and tables_mode == "sample":
            from spgan_tpu.ops.pallas.sphere_sample import st_sample_taps

            ld = self.local_dim
            both = jnp.concatenate([x, coords.astype(x.dtype)], axis=-1)
            taps = st_sample_taps(both, tables)          # (B,K2,H,W,in)
            t_x = taps[..., :ld]
            t_c = encode_coords(taps[..., ld:], self.coord_dim)
            taps = jnp.concatenate([t_x, t_c.astype(x.dtype)], axis=-1)
            taps = taps * s[:, None, None, None, :]
            w9 = wt.reshape(k * k, spec.in_ch, self.out_ch)
            y = jnp.einsum("bthwc,tco->bhwo", taps, w9)
            return y * demod[:, None, None, :]

        if tables is not None:
            from spgan_tpu.ops.pallas.sphere_kernel import (
                fused_sphere_conv, fused_sphere_conv_grouped)

            ld = self.local_dim
            w9 = wt.reshape(k * k, spec.in_ch, self.out_ch)
            xs_main = x * s[:, None, None, :ld]
            if (tables_groups and b % tables_groups == 0
                    and (b // tables_groups) % 8 == 0):
                # tables are per lattice position (G,H,K2), shared by the
                # B//G consecutive samples folded at that position
                y_main = fused_sphere_conv_grouped(
                    xs_main, tables, w9[:, :ld], groups=tables_groups)
            else:
                if tables_groups:  # group size not sublane-aligned: expand
                    assert b % tables_groups == 0, (b, tables_groups)
                    rep = b // tables_groups
                    tables = {k2: jnp.repeat(v, rep, axis=0)
                              for k2, v in tables.items()}
                y_main = fused_sphere_conv(xs_main, tables, w9[:, :ld])
            cs = st_grid_sample_3x3(coords.astype(x.dtype), grid, grid_groups)
            enc = encode_coords(cs, self.coord_dim).astype(x.dtype)
            enc = enc * s[:, None, None, ld:]
            y_coords = _conv_stride_k(enc, wt[:, :, ld:, :], k)
            # NOTE(perf): factoring the coords branch per lattice position
            # (conv is linear in the style-scaled encodings; windows are
            # identical within a position) measured 20.1 panos/s vs 20.4 for
            # this direct form — the batch-shared gather is already cheap
            # and the per-channel stack + einsum overhead outweighs the
            # 16x conv-work reduction on these tiny (3-channel) maps.
            return (y_main.astype(x.dtype) + y_coords) * demod[:, None, None]

        both = jnp.concatenate([x, coords.astype(x.dtype)], axis=-1)
        sampled = st_grid_sample_3x3(both, grid, grid_groups)  # (B,3H,3W,in)
        s_x = sampled[..., :self.local_dim]
        s_c = encode_coords(sampled[..., self.local_dim:], self.coord_dim)
        sampled = jnp.concatenate([s_x, s_c.astype(x.dtype)], axis=-1)

        y = _conv_stride_k(sampled * s[:, None, None, :], wt, k)
        return y * demod[:, None, None, :]

@dataclass(frozen=True)
class SphereSkipConv:
    """TS skip-path sphere conv (RGB 3->3), identity init, LeakyReLU(0.01)."""

    in_ch: int = 3
    out_ch: int = 3
    kernel_size: int = 3

    @property
    def scale(self) -> float:
        return 1.0 / math.sqrt(self.in_ch * self.kernel_size ** 2)

    def init(self, key: jax.Array) -> dict:
        k = self.kernel_size
        w = jnp.zeros((k, k, self.in_ch, self.out_ch), jnp.float32)
        w = w.at[k // 2, k // 2, :, :].set(1.0)
        bound = 1.0 / math.sqrt(self.in_ch * k * k)
        b = jax.random.uniform(key, (self.out_ch,), jnp.float32, -bound, bound)
        return {"weight": w, "bias": b}

    def apply(self, params: dict, x: jnp.ndarray, cp: CoordsPartial,
              grid: Optional[jnp.ndarray] = None,
              grid_groups: int = 0,
              tables: Optional[dict] = None,
              tables_groups: int = 0,
              margin: int = 6) -> jnp.ndarray:
        b, h, w, _ = x.shape
        k = self.kernel_size
        wt = params["weight"].astype(x.dtype) * self.scale
        if tables is not None:
            # row-offset-table path (ops/grid_sample.st_tap_conv): contiguous
            # row gathers + static shift enumeration instead of the 4 point
            # gathers over the (3H,3W) map — same straight-through semantics
            from spgan_tpu.ops.grid_sample import st_tap_conv

            w9 = wt.reshape(k * k, self.in_ch, self.out_ch)
            y = st_tap_conv(x, tables, w9, margin=margin,
                            groups=tables_groups)
        else:
            if grid is None:
                grid = sphere_patch_grid_batch(cp, h, w, k)
            sampled = st_grid_sample_3x3(x, grid, grid_groups)
            y = _conv_stride_k(sampled, wt, k)
        y = y + params["bias"].astype(x.dtype)
        return jax.nn.leaky_relu(y, 0.01)
