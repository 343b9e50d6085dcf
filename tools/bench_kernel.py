"""Microbenchmark: Pallas fused sphere-conv vs XLA gather+conv on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from spgan_tpu.geometry.sphere_grid import (sphere_offset_tables,
                                            sphere_patch_grid)
from spgan_tpu.ops.grid_sample import bilinear_grid_sample_shared
from spgan_tpu.ops.pallas.sphere_kernel import fused_sphere_conv


def conv_s3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (3, 3), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run(H, B, C=259, Cout=256, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.randn(3, 3, C, Cout).astype(np.float32) * 0.06).astype(dtype)
    args = (0.1, 0.65, 0.3, 0.85, 0.0, 0.6667)
    kw = dict(h=H, w=H, k=3, x_total=65, y_total=48)

    grid = sphere_patch_grid(*args, **kw)

    @jax.jit
    def xla_path(x):
        s = jax.vmap(bilinear_grid_sample_shared)(
            x.reshape(1, B, H, H, C), grid[None])
        return conv_s3(s.reshape(B, 3 * H, 3 * H, C), w)

    t = sphere_offset_tables(*args, **kw)
    tables = {k: jnp.tile(v[None], (B, 1, 1)) for k, v in t.items()}
    w9 = w.reshape(9, C, Cout)

    @jax.jit
    def pallas_path(x):
        return fused_sphere_conv(x, tables, w9)

    from spgan_tpu.utils.misc import sync_fetch

    for name, fn in (("xla", xla_path), ("pallas", pallas_path)):
        y = fn(x)
        sync_fetch(y)  # host value fetch = the only reliable barrier
        t0 = time.perf_counter()
        for _ in range(20):
            y = fn(x)
        sync_fetch(y)
        dt = (time.perf_counter() - t0) / 20
        print(f"H={H} B={B} {str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):8s} {name:6s}: {dt*1000:7.2f} ms")
    # correctness on device
    ya = np.asarray(xla_path(x), np.float32)
    yb = np.asarray(pallas_path(x), np.float32)
    err = np.abs(ya - yb).max() / (np.abs(ya).max() + 1e-6)
    print(f"  rel err: {err:.2e}")


if __name__ == "__main__":
    for H in (35, 17):
        run(H, 64)
