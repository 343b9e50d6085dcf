"""Microbench: ToRGB k1 conv (512->3) strategies at the 101^2 x 64 shape.

The 3-channel output occupies 3 of 128 lanes — XLA's conv runs at ~160 GB/s
effective read bandwidth (tools/bench_ts_layers.py). Candidates:
  conv3      — current: conv_general 1x1 512->3
  dot3       — reshape to (B*H*W, 512) @ (512, 3)
  conv128    — 512->128 conv with zero-padded kernel, slice [:, ..., :3]
  dot128     — matmul with N=128 padded weight, slice

Usage: python tools/bench_torgb.py [H] [B]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spgan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

H = int(sys.argv[1]) if len(sys.argv) > 1 else 101
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
C = 512
DT = jnp.bfloat16

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, H, C), DT)
w = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, C, 3), DT)


def conv3(x_):
    return jax.lax.conv_general_dilated(
        x_, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dot3(x_):
    y = x_.reshape(-1, C) @ w.reshape(C, 3)
    return y.reshape(B, H, H, 3)


wpad = jnp.zeros((1, 1, C, 128), DT).at[:, :, :, :3].set(w)


def conv128(x_):
    y = jax.lax.conv_general_dilated(
        x_, wpad, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[..., :3]


def dot128(x_):
    y = x_.reshape(-1, C) @ wpad.reshape(C, 128)
    return y.reshape(B, H, H, 128)[..., :3]


def timed(fn, name):
    @jax.jit
    def run(x0):
        def body(_, xc):
            y = fn(xc)
            return xc + (1e-6 * jnp.mean(y, axis=3, keepdims=True)
                         ).astype(xc.dtype)
        return jax.lax.fori_loop(0, 30, body, x0).sum()

    _ = float(run(x))
    t0 = time.perf_counter()
    s = float(run(x))
    dt = (time.perf_counter() - t0) / 30
    gb = (x.size * 2) / 1e9
    print(f"{name:10s} {dt*1e3:7.3f} ms   {gb/dt:6.0f} GB/s eff-read"
          f"  ({s:.3e})")


for nm, fn in [("conv3", conv3), ("dot3", dot3),
               ("conv128", conv128), ("dot128", dot128)]:
    timed(fn, nm)
a = np.asarray(conv3(x), np.float32)
for nm, fn in [("dot3", dot3), ("conv128", conv128), ("dot128", dot128)]:
    d = np.abs(a - np.asarray(fn(x), np.float32)).max()
    print(f"parity {nm}: {d:.2e}")
