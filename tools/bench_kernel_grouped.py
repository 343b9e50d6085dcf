"""Microbenchmark: the grouped Pallas sphere kernel at the engine's real
shapes (the closed_call.* ops of the headline trace: G=8 positions x Bg=8
panoramas, SS sizes 35/29/23/17, C=Cout=256, bf16).

Usage: python tools/bench_kernel_grouped.py [dtype=bfloat16]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spgan_tpu.geometry.sphere_grid import sphere_offset_tables
from spgan_tpu.ops.pallas.sphere_kernel import fused_sphere_conv_grouped
from spgan_tpu.utils.misc import sync_fetch

dt_ = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
dtype = jnp.bfloat16 if dt_ == "bfloat16" else jnp.float32
G, Bg, C, Cout = 8, 8, 256, 256
B = G * Bg

for H in (35, 29, 23, 17):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32)).astype(dtype)
    w9 = jnp.asarray(
        rng.randn(9, C, Cout).astype(np.float32) * 0.06).astype(dtype)
    kw = dict(h=H, w=H, k=3, x_total=65, y_total=48)
    t = sphere_offset_tables(0.1, 0.65, 0.3, 0.85, 0.0, 0.6667, **kw)
    tables = {k: jnp.tile(v[None], (G, 1, 1)) for k, v in t.items()}

    REPS = 20

    @jax.jit
    def fn(x):
        # chain in-graph (bench_convt methodology): per-dispatch overhead on
        # the remote runtime is ~ms, so one program runs all reps, each
        # feeding the next (C == Cout), and the caller fetches a value
        def body(_, h):
            return fused_sphere_conv_grouped(h, tables, w9, groups=G)

        return jax.lax.fori_loop(0, REPS, body, x)

    y = fn(x)
    sync_fetch(y)
    t0 = time.perf_counter()
    y = fn(x)
    sync_fetch(y)
    dt = (time.perf_counter() - t0) / REPS
    flops = 2 * B * H * H * 9 * C * Cout
    print(f"H={H} G={G} Bg={Bg} {dt_}: {dt*1000:7.2f} ms "
          f"({flops/dt/1e12:.1f} TF/s conv-math)")
