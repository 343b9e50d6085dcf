"""Modulated (style) convolutions, StyledConv, ToRGB, noise injection.

Behavioral parity targets (reference file:line):
  - ModulatedConv2d  models/ops.py:235-729
  - NoiseInjection   models/ops.py:732-785
  - ConstantInput    models/ops.py:788-795
  - StyledConv       models/ops.py:798-863
  - ToRGB            models/ops.py:866-929 (== models/spgan_ops.py:1523-1586)

TPU-native formulation: instead of the reference's per-sample grouped conv
(weights reshaped to groups=batch, models/ops.py:608-636), we use the exactly
equivalent *scale-input* form that the reference itself uses for spatial
styles (models/ops.py:651-726):

    y[b] = demod[b] * conv(x[b] * s[b], scale * W)

For demodulated convs this is bit-for-bit the same math:
    conv(x, W * s[b]) * rsqrt(sum (W*s[b])^2)  ==  conv(x * s[b], W) * demod
and it keeps a single large batched convolution on the MXU (no groups, no
weight materialization per sample).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.ops.linear import EqualLinear, fused_leaky_relu
from spgan_tpu.ops.upfirdn import Blur, Upsample


def _conv(x, w, *, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_transpose2(x, w):
    """stride-2 transposed conv, equivalent to torch conv_transpose2d(s=2,p=0)
    (reference models/ops.py:608-636 upsample branch): zero-stuffing
    (lhs_dilation=2) + full padding + correlation with the spatially-flipped
    kernel. Output size 2H+k-2 for odd k.

    Measured on v5e (tools/bench_convt.py, 53^2x512x512 b64 bf16): XLA's
    conv emitter handles the base dilation at 110 TF/s useful (~78% of the
    realistic matmul ceiling) — it does NOT compute densely over the stuffed
    zeros. The explicit phase decomposition below benches 2.3x SLOWER (the
    ee/eo/oe/oo interleave relayouts dominate); it is kept for backends where
    base-dilated convs are weak, with exact-parity tests.
    """
    kh, kw = w.shape[0], w.shape[1]
    wf = jnp.flip(w, (0, 1))
    return jax.lax.conv_general_dilated(
        x, wf, window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _interleave2(a, b, axis):
    """(..., n, ...) x2 -> (..., 2n, ...) alternating a/b along `axis`."""
    s = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return s.reshape(shape)


def _conv_transpose2_phase(x, w):
    """Phase-decomposed stride-2 transposed conv — exact alternative to
    _conv_transpose2 for backends with weak base-dilated convs (measured
    2.3x SLOWER than lhs_dilation on TPU v5e; see _conv_transpose2).

    Each output-parity class (ee/eo/oe/oo) touches a fixed sub-grid of
    kernel taps, so the transposed conv is exactly four small dense convs
    interleaved:

        out[2q+dr, 2r+dc] = sum_ab x[q-oa+a, r-ob+b] * wf[2a+pr, 2b+pc]

    with wf the flipped kernel and (pr,pc) the tap parity selected by the
    output parity. Equal to the dilated form up to FP reduction order (every
    dropped tap multiplies an exact zero; bit-identical on TPU, ~1e-6 noise
    on CPU). All-linear ops, so R1/PPL double-grad flows as before.
    """
    k = w.shape[0]
    assert w.shape[1] == k and k % 2 == 1, w.shape
    B, H, W, _ = x.shape
    wf = jnp.flip(w, (0, 1))
    pe, po = (k - 1) // 2, (k - 3) // 2  # per-dim pads: even / odd phase

    def conv(x_, kern, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            x_, kern, (1, 1), [(pad_h, pad_h), (pad_w, pad_w)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ee = conv(x, wf[0::2, 0::2], pe, pe)   # (B, H+pe, W+pe, O)
    eo = conv(x, wf[0::2, 1::2], pe, po)   # (B, H+pe, W+pe-1, O)
    oe = conv(x, wf[1::2, 0::2], po, pe)
    oo = conv(x, wf[1::2, 1::2], po, po)
    # odd phases are one shorter per dim: pad with one trailing zero, which
    # lands beyond the 2H+k-2 crop below
    eo = jnp.pad(eo, ((0, 0), (0, 0), (0, 1), (0, 0)))
    oe = jnp.pad(oe, ((0, 0), (0, 1), (0, 0), (0, 0)))
    oo = jnp.pad(oo, ((0, 0), (0, 1), (0, 1), (0, 0)))
    even_rows = _interleave2(ee, eo, axis=2)
    odd_rows = _interleave2(oe, oo, axis=2)
    out = _interleave2(even_rows, odd_rows, axis=1)
    return out[:, :2 * H + k - 2, :2 * W + k - 2]


@dataclass(frozen=True)
class ModulatedConv2d:
    in_ch: int
    out_ch: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    blur_kernel: Tuple[float, ...] = (1.0, 2.0, 1.0)
    no_zero_pad: bool = False
    identity_init: bool = False  # gs-variant: center-tap-1 init
    fuse_blur: bool = False      # see apply(): measured slower on v5e
    eps: float = 1e-8

    @property
    def scale(self) -> float:
        return 1.0 / math.sqrt(self.in_ch * self.kernel_size ** 2)

    @property
    def dirty_rm_size(self) -> Tuple[int, int]:
        # reference models/ops.py:266-293
        if self.upsample:
            if self.no_zero_pad:
                p = len(self.blur_kernel) // 2
                return (p, p)
            return (0, 0)
        if self.no_zero_pad:
            return (self.kernel_size // 2, self.kernel_size // 2)
        return (0, 0)

    @property
    def padding(self) -> int:
        if self.upsample:
            return 0
        return 0 if self.no_zero_pad else self.kernel_size // 2

    def _blur(self) -> Blur:
        if self.no_zero_pad:
            return Blur(self.blur_kernel, pad=(0, 0), upsample_factor=2)
        if len(self.blur_kernel) % 2 == 1:
            p = len(self.blur_kernel) // 2
            pad0 = pad1 = p
        else:
            # original StyleGAN2 even-kernel padding (reference ops.py:273-278)
            p = (len(self.blur_kernel) - 2) - (self.kernel_size - 1)
            pad0 = (p + 1) // 2 + 1
            pad1 = p // 2 + 1
        return Blur(self.blur_kernel, pad=(pad0, pad1), upsample_factor=2)

    def _fused_weight(self, w: jnp.ndarray) -> jnp.ndarray:
        """(k,k,in,out) -> (k+2,k+2,in,out): full 2-D convolution of each
        filter with the (blur_kernel x blur_kernel)/sum * 4 FIR stencil."""
        from spgan_tpu.ops.upfirdn import make_kernel

        b2 = jnp.asarray(make_kernel(np.asarray(self.blur_kernel,
                                                np.float32)) * 4.0, w.dtype)
        k = self.kernel_size
        cin, cout = w.shape[2], w.shape[3]
        # treat (in*out) as batch: full conv == pad k-1 and correlate with
        # the flipped stencil; the stencil is symmetric so no flip needed
        wb = w.transpose(2, 3, 0, 1).reshape(cin * cout, k, k, 1)
        y = jax.lax.conv_general_dilated(
            wb, b2[:, :, None, None], (1, 1),
            [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(cin, cout, k + 2, k + 2).transpose(2, 3, 0, 1)

    def init(self, key: jax.Array) -> dict:
        k = self.kernel_size
        kw, km = jax.random.split(key)
        if self.identity_init:
            # reference models/spgan_ops_gs.py:374-383: every (out,in) pair
            # gets a 1 at the kernel center, zeros elsewhere.
            w = jnp.zeros((k, k, self.in_ch, self.out_ch), jnp.float32)
            w = w.at[k // 2, k // 2, :, :].set(1.0)
        else:
            w = jax.random.normal(kw, (k, k, self.in_ch, self.out_ch), jnp.float32)
        params = {"weight": w}
        if self.style_dim > 0:
            mod = EqualLinear(self.style_dim, self.in_ch, bias_init=1.0)
            params["modulation"] = mod.init(km)
        return params

    def modulation_spec(self) -> EqualLinear:
        return EqualLinear(self.style_dim, self.in_ch, bias_init=1.0)

    def style_scale(self, params: dict, style: jnp.ndarray) -> jnp.ndarray:
        """(B, style_dim) -> per-input-channel modulation (B, in_ch)."""
        return self.modulation_spec().apply(params["modulation"], style)

    def demod_factors(self, params: dict, s: jnp.ndarray) -> jnp.ndarray:
        """(B, in_ch) -> (B, out_ch) demodulation rsqrt factors."""
        w = params["weight"].astype(s.dtype) * self.scale  # (k,k,in,out)
        w2 = jnp.sum(jnp.square(w), axis=(0, 1))  # (in, out)
        denom = jnp.einsum("bi,io->bo", jnp.square(s), w2)
        return jax.lax.rsqrt(denom + self.eps)

    def apply_spatial_style(self, params: dict, x: jnp.ndarray,
                            style: jnp.ndarray) -> jnp.ndarray:
        """Spatially-shaped styles for style-fusion generation
        (reference models/ops.py:637-726): style (B,Hs,Ws,style_dim) is
        center-cropped to x, modulation applied pointwise, demodulation
        estimated per pixel — exactly the reference's scale-input path."""
        style = align_spatial(style, x)
        sb, sh, sw, _ = style.shape
        mod = self.modulation_spec()
        s_map = mod.apply(params["modulation"],
                          style.reshape(-1, self.style_dim))
        s_map = s_map.reshape(sb, sh, sw, self.in_ch)
        xs = x * s_map.astype(x.dtype)
        w = params["weight"].astype(x.dtype) * self.scale
        if self.demodulate:
            w2 = jnp.sum(jnp.square(w), axis=(0, 1))  # (in, out)
            demod = jax.lax.rsqrt(
                jnp.einsum("bhwi,io->bhwo", jnp.square(s_map), w2) + self.eps
            ).astype(x.dtype)
        if self.upsample:
            y = _conv_transpose2(xs, w)
            y = y[:, 1:-1, 1:-1, :]
            if self.demodulate:
                # reference interpolates the per-pixel demod map to the
                # upsampled size (ops.py:707-713, align_corners=True)
                from spgan_tpu.infer.calibrate import resize_align_corners

                demod = resize_align_corners(demod, y.shape[1], y.shape[2])
                y = y * demod.astype(x.dtype)
            return self._blur()(y)
        y = _conv(xs, w, padding=self.padding)
        if self.demodulate:
            if self.padding == 0:
                d0, d1 = self.dirty_rm_size
                demod = demod[:, d0:sh - d0, d1:sw - d1]
            y = y * demod
        return y

    def apply(self, params: dict, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        """x: (B,H,W,in_ch) NHWC; style: (B,style_dim) or (B,in_ch) pre-mod,
        or (B,Hs,Ws,style_dim) spatially-shaped (style fusion).

        Returns NHWC output; spatial size follows the reference's no-pad
        algebra (upsample: 2H-1-2 after blur for blur_kernel len 3; plain:
        H - 2*(k//2) when no_zero_pad).
        """
        if style.ndim == 4:
            return self.apply_spatial_style(params, x, style)
        s = self.style_scale(params, style) if style.shape[-1] == self.style_dim \
            else style
        w = params["weight"].astype(x.dtype) * self.scale
        xs = x * s[:, None, None, :].astype(x.dtype)
        if self.demodulate:
            demod = self.demod_factors(params, s).astype(x.dtype)
        if self.upsample:
            if self.fuse_blur and self.no_zero_pad and \
                    len(self.blur_kernel) % 2 == 1:
                # Exact composition: convT(k3,s2) -> crop1 -> blur(k3, valid)
                # == convT(k5 = W (*) B, s2) -> crop3. Measured SLOWER on v5e
                # (dense 25/9x matmul cost outweighs the saved depthwise
                # pass) — kept as an option, off by default.
                y = _conv_transpose2(xs, self._fused_weight(w))
                y = y[:, 3:-3, 3:-3, :]
                if self.demodulate:
                    y = y * demod[:, None, None, :]
            else:
                y = _conv_transpose2(xs, w)
                if self.no_zero_pad:
                    y = y[:, 1:-1, 1:-1, :]
                if self.demodulate:
                    y = y * demod[:, None, None, :]
                y = self._blur()(y)
        else:
            y = self._plain_conv_lane_split(xs, w)
            if self.demodulate:
                y = y * demod[:, None, None, :]
        return y

    def _plain_conv_lane_split(self, xs: jnp.ndarray,
                               w: jnp.ndarray) -> jnp.ndarray:
        """Plain conv, with a lane-alignment split for ragged in_ch.

        The SS planar k7 conv takes 259 = 256 features + 3 encoded coords
        (generator.py StructureSynthesizer.planar_spec); the TPU conv pads
        the contraction dim to the 128-lane tile, so the single conv does
        384/259 = 1.48x the useful MXU work (measured 130 TF/s vs 193 for
        the aligned 512-convs in the same program — exactly the padding
        ratio). Splitting 256 + 3 into conv + conv doesn't help (the
        3-channel conv pads right back to 128 lanes); instead the ragged
        tail becomes im2col patches + one (B*H'*W', rem*k^2) @ (rem*k^2,
        out) matmul, whose contraction dim rem*k^2 (e.g. 27 at k=3, 147 at
        k=7) wastes at most one lane tile TOTAL instead of one per tap
        column.  Exact up to float reassociation (one extra add per output
        element).  Only fires when in_ch is large and barely over a lane
        multiple; everything in the shipped models except the SS planar
        convs is already aligned."""
        rem = self.in_ch % 128
        if not (self.in_ch > 128 and 0 < rem <= 16):
            return _conv(xs, w, padding=self.padding)
        split = self.in_ch - rem
        k = self.kernel_size
        y = _conv(xs[..., :split], w[:, :, :split, :], padding=self.padding)
        pads = [(self.padding, self.padding)] * 2
        patches = jax.lax.conv_general_dilated_patches(
            xs[..., split:], filter_shape=(k, k), window_strides=(1, 1),
            padding=pads, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches channel order is input-channel-major, spatial-minor:
        # (rem, k, k) flattened (lax.conv_general_dilated_patches docstring)
        w_tail = w[:, :, split:, :].transpose(2, 0, 1, 3).reshape(
            k * k * rem, self.out_ch)
        return y + jnp.einsum("bhwk,ko->bhwo", patches, w_tail)


@dataclass(frozen=True)
class NoiseInjection:
    """x + w * noise. The reference's mutable testing-noise cache
    (models/ops.py:738-773) is replaced by precomputed noise fields sliced by
    the inference managers — noise is always explicit here."""

    def init(self) -> dict:
        return {"weight": jnp.zeros((), jnp.float32)}

    def apply(self, params: dict, x: jnp.ndarray,
              noise: Optional[jnp.ndarray] = None,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
        if noise is None:
            if rng is None:
                return x
            b, h, w, _ = x.shape
            noise = jax.random.normal(rng, (b, h, w, 1), x.dtype)
        return x + params["weight"].astype(x.dtype) * noise


@dataclass(frozen=True)
class ConstantInput:
    channel: int
    size: int = 4

    def init(self, key: jax.Array) -> dict:
        return {"input": jax.random.normal(
            key, (1, self.size, self.size, self.channel), jnp.float32)}

    def apply(self, params: dict, batch: int) -> jnp.ndarray:
        return jnp.tile(params["input"], (batch, 1, 1, 1))


@dataclass(frozen=True)
class StyledConv:
    """ModulatedConv2d + noise injection + fused bias LeakyReLU*sqrt(2).

    activation "lrelu_plain" mirrors the gs-variant "LeakyReLU_n": plain
    LeakyReLU(0.01), no bias, no sqrt(2) gain (spgan_ops_gs.py:1085-1089).
    """

    conv: ModulatedConv2d
    disable_noise: bool = False
    activation: str = "fused_lrelu"  # "fused_lrelu" | "lrelu_plain"

    def init(self, key: jax.Array) -> dict:
        kc, kn = jax.random.split(key)
        params = {"conv": self.conv.init(kc)}
        if not self.disable_noise:
            params["noise"] = NoiseInjection().init()
        if self.activation == "fused_lrelu":
            params["act_bias"] = jnp.zeros((self.conv.out_ch,), jnp.float32)
        return params

    def apply(self, params: dict, x: jnp.ndarray, style: jnp.ndarray,
              noise: Optional[jnp.ndarray] = None,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
        y = self.conv.apply(params["conv"], x, style)
        if not self.disable_noise:
            y = NoiseInjection().apply(params["noise"], y, noise=noise, rng=rng)
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(y, params["act_bias"])
        return jax.nn.leaky_relu(y, 0.01)


def align_spatial(source: Optional[jnp.ndarray], target: jnp.ndarray):
    """Center-crop `source` (NHWC) to `target`'s spatial size
    (reference ToRGB.align_spatial_size, models/ops.py:894-904)."""
    if source is None:
        return None
    sh, sw = source.shape[1], source.shape[2]
    th, tw = target.shape[1], target.shape[2]
    if (sh, sw) == (th, tw):
        return source
    assert (sh - th) % 2 == 0 and (sw - tw) % 2 == 0, (source.shape, target.shape)
    h0 = (sh - th) // 2
    w0 = (sw - tw) // 2
    return source[:, h0:h0 + th, w0:w0 + tw, :]


@dataclass(frozen=True)
class ToRGB:
    in_ch: int
    style_dim: int
    upsample: bool = True
    blur_kernel: Tuple[float, ...] = (1.0, 2.0, 1.0)
    no_zero_pad: bool = False

    def conv_spec(self) -> ModulatedConv2d:
        return ModulatedConv2d(
            in_ch=self.in_ch, out_ch=3, kernel_size=1,
            style_dim=self.style_dim, demodulate=False,
            no_zero_pad=self.no_zero_pad, blur_kernel=self.blur_kernel)

    def init(self, key: jax.Array) -> dict:
        return {
            "conv": self.conv_spec().init(key),
            "bias": jnp.zeros((1, 1, 1, 3), jnp.float32),
        }

    def apply(self, params: dict, x: jnp.ndarray, style: jnp.ndarray,
              skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out = self.conv_spec().apply(params["conv"], x, style)
        out = out + params["bias"].astype(out.dtype)
        if skip is not None:
            up = Upsample(self.blur_kernel, no_zero_pad=self.no_zero_pad)
            skip = up(skip)
            if self.no_zero_pad:
                skip = align_spatial(skip, out)
            out = out + skip
        return out
