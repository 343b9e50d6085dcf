"""upfirdn2d resampling family as fused XLA depthwise convolutions.

The reference implements this as a hand-written CUDA kernel
(models/custom_ops/upfirdn2d_kernel.cu, with CPU fallback
models/custom_ops/upfirdn2d.py:164-205).  On TPU the same fused
upsample-pad-FIR-downsample is exactly one `lax.conv_general_dilated` with
``lhs_dilation=up``, (possibly negative) padding, depthwise feature groups and
``window_strides=down`` — XLA lowers it onto the convolution units directly,
so no handwritten kernel is needed for parity; a Pallas kernel remains an
optimization hook (see spgan_tpu/ops/pallas/).

Behavioral parity targets:
  - make_kernel   models/ops.py:24-29
  - Upsample      models/ops.py:32-61 (incl. the no_zero_pad conv-transpose
                  path used by the TS skip chain)
  - Downsample    models/ops.py:64-79
  - Blur          models/ops.py:88-140 (gaussian/mean priors, replicate pad)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp


def make_kernel(k: Union[Sequence[float], np.ndarray]) -> np.ndarray:
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def gaussian_kernel(kernel_size: int, std: float = 1.0) -> np.ndarray:
    # reference models/ops.py:82-85 (scipy.signal.gaussian)
    n = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    g = np.exp(-(n ** 2) / (2 * std * std))
    k2 = np.outer(g, g)
    return k2 / k2.sum()


def _depthwise(x: jnp.ndarray, k2d: jnp.ndarray, *, lhs_dilation=(1, 1),
               padding=((0, 0), (0, 0)), strides=(1, 1)) -> jnp.ndarray:
    """Depthwise correlation with the *flipped* FIR kernel (= convolution)."""
    c = x.shape[-1]
    kh, kw = k2d.shape
    w = jnp.flip(k2d, (0, 1)).reshape(kh, kw, 1, 1).astype(x.dtype)
    w = jnp.tile(w, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=strides,
        padding=list(padding),
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """NHWC equivalent of the reference CUDA upfirdn2d (zero-insert upsample by
    `up`, pad (pad0, pad1) on both spatial dims, FIR filter, stride-`down`).

    Note: the CUDA kernel's zero-insertion produces up*H samples (trailing
    zeros included); lhs_dilation yields up*H-(up-1), so the high-side padding
    gets the missing (up-1) zeros to match output length exactly."""
    extra = up - 1
    return _depthwise(
        x, jnp.asarray(kernel),
        lhs_dilation=(up, up),
        padding=((pad[0], pad[1] + extra), (pad[0], pad[1] + extra)),
        strides=(down, down),
    )


def blur(x: jnp.ndarray, kernel: jnp.ndarray, pad: Tuple[int, int]) -> jnp.ndarray:
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


@dataclass(frozen=True)
class Blur:
    """Parameter-free FIR blur. kernel is a 1-D/2-D stencil (pre-`make_kernel`).

    padding_mode "replicate" pads with edge values before a valid FIR
    (reference models/ops.py:105-114,136-140).
    """

    kernel: Tuple[float, ...] = (1.0, 2.0, 1.0)
    pad: Tuple[int, int] = (0, 0)
    upsample_factor: int = 1
    padding_mode: str = "zero"  # "zero" | "replicate"

    def k2d(self) -> np.ndarray:
        k = make_kernel(np.asarray(self.kernel, np.float32))
        if self.upsample_factor > 1:
            k = k * (self.upsample_factor ** 2)
        return k

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # NOTE(perf): a separable shifted-slice-add formulation (two fused
        # elementwise passes) was measured IN-ENGINE at 17.4 panos/s vs 19.4
        # for this depthwise conv on v5e — the extra materialized
        # intermediate costs more than the conv (XLA runs the 9-tap
        # depthwise near memory bandwidth already). Keep the conv.
        k = jnp.asarray(self.k2d())
        if self.padding_mode == "replicate":
            p = self.pad
            rp = (p[0], p[1], p[0], p[1]) if len(self.pad) == 2 else self.pad
            x = jnp.pad(x, ((0, 0), (rp[2], rp[3]), (rp[0], rp[1]), (0, 0)),
                        mode="edge")
            return blur(x, k, (0, 0))
        return blur(x, k, self.pad)


@dataclass(frozen=True)
class Upsample:
    """x2 FIR upsampling.

    no_zero_pad=True (the shipped TS config) follows the reference's
    conv-transpose formulation: zero-stuff by 2, full-pad, FIR with kernel*4,
    then crop one dirty pixel per side => output 2H-1 (models/ops.py:49-57).
    """

    kernel: Tuple[float, ...] = (1.0, 2.0, 1.0)
    factor: int = 2
    no_zero_pad: bool = False

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = jnp.asarray(make_kernel(np.asarray(self.kernel, np.float32))
                        * (self.factor ** 2))
        if self.no_zero_pad:
            kh = k.shape[0]
            y = _depthwise(x, k, lhs_dilation=(self.factor, self.factor),
                           padding=((kh - 1, kh - 1), (kh - 1, kh - 1)))
            return y[:, 1:-1, 1:-1, :]
        kh = k.shape[0]
        p = kh - self.factor
        pad0 = (p + 1) // 2 + self.factor - 1
        pad1 = p // 2
        return upfirdn2d(x, k, up=self.factor, down=1, pad=(pad0, pad1))


@dataclass(frozen=True)
class Downsample:
    kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)
    factor: int = 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k2 = make_kernel(np.asarray(self.kernel, np.float32))
        p = k2.shape[0] - self.factor
        pad0 = (p + 1) // 2
        pad1 = p // 2
        return upfirdn2d(x, jnp.asarray(k2), up=1, down=self.factor,
                         pad=(pad0, pad1))
