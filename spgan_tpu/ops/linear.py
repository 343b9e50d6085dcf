"""Equalized-LR linear/conv primitives and activations.

Behavioral parity targets (reference file:line):
  - EqualLinear        models/ops.py:190-222
  - EqualConv2d        models/ops.py:143-187
  - fused_leaky_relu   models/custom_ops/fused_act.py (CUDA kernel): out =
                       leaky_relu(x + bias, 0.2) * sqrt(2)
  - PixelNorm          models/ops.py:13-21
  - ScaledLeakyReLU    models/ops.py:225-232

Design: pure-functional "spec" dataclasses.  A spec holds only static
hyperparameters; ``init(key)`` returns a param pytree (plain dict of jnp
arrays) and ``apply(params, ...)`` is a pure function.  All activations are
ordinary XLA ops (fused by the compiler; grad-of-grad safe for R1/PPL).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def pixel_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """x * rsqrt(mean(x^2, channel) + eps). Channel-last by default."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def fused_leaky_relu(x: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                     negative_slope: float = 0.2, scale: float = SQRT2) -> jnp.ndarray:
    """bias-add + LeakyReLU + sqrt(2) gain (channel-last bias broadcast).

    The bias is cast to x's dtype: adding the f32 bias param to bf16
    activations would silently promote every downstream feature map to f32
    (discovered in-engine: SS layers 1-3 and the whole TS chain ran with
    doubled HBM traffic; the fix alone is worth ~19% end-to-end: 20.4 -> 24.1 panos/s)."""
    if bias is not None:
        b = bias.astype(x.dtype)
        x = x + b.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope) * SQRT2


@dataclass(frozen=True)
class EqualLinear:
    in_dim: int
    out_dim: int
    bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None | "fused_lrelu"

    @property
    def scale(self) -> float:
        return (1.0 / math.sqrt(self.in_dim)) * self.lr_mul

    def init(self, key: jax.Array) -> dict:
        # weight stored (in, out) for x @ w; torch checkpoints are (out, in).
        w = jax.random.normal(key, (self.in_dim, self.out_dim), jnp.float32)
        params = {"weight": w / self.lr_mul}
        if self.bias:
            params["bias"] = jnp.full((self.out_dim,), self.bias_init, jnp.float32)
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        w = params["weight"].astype(x.dtype) * self.scale
        y = x @ w
        b = params.get("bias")
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(
                y, None if b is None else b.astype(x.dtype) * self.lr_mul)
        if b is not None:
            y = y + b.astype(x.dtype) * self.lr_mul
        return y


@dataclass(frozen=True)
class EqualConv2d:
    """Equalized conv, NHWC activations / HWIO weights.

    padding: int (symmetric zero pad), or "valid".
    """

    in_ch: int
    out_ch: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    bias: bool = True

    @property
    def scale(self) -> float:
        return 1.0 / math.sqrt(self.in_ch * self.kernel_size ** 2)

    def init(self, key: jax.Array) -> dict:
        k = self.kernel_size
        w = jax.random.normal(key, (k, k, self.in_ch, self.out_ch), jnp.float32)
        params = {"weight": w}
        if self.bias:
            params["bias"] = jnp.zeros((self.out_ch,), jnp.float32)
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        w = params["weight"].astype(x.dtype) * self.scale
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if "bias" in params:
            y = y + params["bias"].astype(x.dtype)
        return y
