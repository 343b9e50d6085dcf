"""On-device numeric check of the Pallas sphere kernels vs the XLA gather
path, at the real engine shapes. Interpret-mode tests prove the math; this
proves the Mosaic compilation (incl. the grouped kernel's
(Hb*W, 8, C) -> (Hb*W*8, C) collapse) on the actual chip.

Usage: python tools/check_kernel_device.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spgan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.geometry.coords import CoordsPartial
from spgan_tpu.geometry.sphere_grid import (sphere_offset_tables,
                                            sphere_patch_grid_batch)
from spgan_tpu.ops.grid_sample import st_grid_sample_3x3
from spgan_tpu.ops.pallas.sphere_kernel import (fused_sphere_conv,
                                                fused_sphere_conv_grouped)


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.RandomState(0)
    G, Bg, C, Cout = 4, 16, 256, 256
    B = G * Bg
    for H in (35, 29, 23, 17):
        cp = CoordsPartial(
            p_x_st=jnp.asarray(rng.uniform(0.1, 0.3, (G,))),
            p_x_ed=jnp.asarray(rng.uniform(0.6, 0.8, (G,))),
            p_y_st=jnp.asarray(rng.uniform(0.0, 0.5, (G,))),
            p_y_ed=jnp.asarray(rng.uniform(0.55, 0.9, (G,))),
            circular=jnp.zeros((G,)),
            x_total=65, y_total=48, grid_partial=0.6667, test_flag=True)
        fn = lambda a, b, c, d, e: sphere_offset_tables(
            a, b, c, d, e, 0.6667, h=H, w=H, k=3, x_total=65, y_total=48)
        tg = jax.vmap(fn)(cp.p_x_st, cp.p_x_ed, cp.p_y_st, cp.p_y_ed,
                          cp.circular)
        x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
        w9 = jnp.asarray(rng.randn(9, C, Cout).astype(np.float32) * 0.05)

        # XLA gather reference (batch-shared grids, like the engine)
        grid = sphere_patch_grid_batch(cp, H, H)
        sampled = st_grid_sample_3x3(x, grid, G)  # (B, 3H, 3H, C)
        wt = w9.reshape(3, 3, C, Cout)
        ref = jax.lax.conv_general_dilated(
            sampled, wt, (3, 3), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = np.asarray(ref)

        tp = {k: jnp.repeat(v, Bg, axis=0) for k, v in tg.items()}
        per_sample = np.asarray(fused_sphere_conv(x, tp, w9))
        grouped = np.asarray(fused_sphere_conv_grouped(x, tg, w9, groups=G))

        sc = np.abs(ref).max()
        for name, got in (("per-sample", per_sample), ("grouped", grouped)):
            rel = np.abs(got - ref).max() / sc
            status = "OK" if rel < 1e-3 else "FAIL"
            print(f"H={H:3d} {name:10s} rel err vs gather path: "
                  f"{rel:.2e}  {status}", flush=True)
            assert rel < 1e-3, (H, name, rel)
        rel_g = np.abs(grouped - per_sample).max() / sc
        print(f"H={H:3d} grouped vs per-sample: {rel_g:.2e}", flush=True)


if __name__ == "__main__":
    main()
