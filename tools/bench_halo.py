"""A/B the width-sharded halo path against the folded engine on ONE device.

The halo engine exists for latent/noise fields that exceed one device's HBM
(reference loop it scales out: close_loop_infinite_generation.py:170-305);
this bench pins how much its ring machinery costs when the fields DO fit,
i.e. its overhead vs the folded single-device engine on the same panorama
(VERDICT r4 next-round #4: target within ~1.5x).

Usage: python tools/bench_halo.py [width=768] [col_chunk=1] [dtype=bfloat16]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

from spgan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from spgan_tpu.config import Config
from spgan_tpu.infer.engine import PanoramaEngine
from spgan_tpu.infer.halo import make_width_sharded_generate
from spgan_tpu.infer.stitcher import build_close_loop_plan
from spgan_tpu.models.generator import Generator
from spgan_tpu.parallel.mesh import make_mesh
from spgan_tpu.utils.misc import sync_fetch

width = int(sys.argv[1]) if len(sys.argv) > 1 else 768
col_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1
dt_ = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
BATCH, REPS = 4, 4

cfg = Config()
g = Generator.from_config(cfg)
params = g.init(jax.random.PRNGKey(0))
plan = build_close_loop_plan(g, 384, width)
mesh1 = make_mesh(jax.devices()[:1])

halo_gen = make_width_sharded_generate(
    g, plan, mesh1, BATCH, cfg.train_params.partial,
    compute_dtype=dt_, col_chunk=col_chunk)
t0 = time.perf_counter()
out = halo_gen(params, jax.random.PRNGKey(1))
sync_fetch(out)
print(f"halo compile+1st: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
for i in range(REPS):
    out = halo_gen(params, jax.random.PRNGKey(2 + i))
sync_fetch(out)
halo_dt = time.perf_counter() - t0
halo_rate = REPS * BATCH / halo_dt

eng = PanoramaEngine(g=g, plan=plan, batch=BATCH, patch_chunk=8,
                     grid_partial=cfg.train_params.partial, compute_dtype=dt_)
t0 = time.perf_counter()
m = eng.generate(params, jax.random.PRNGKey(1))
sync_fetch(m)
print(f"engine compile+1st: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
for i in range(REPS):
    m = eng.generate(params, jax.random.PRNGKey(2 + i))
sync_fetch(m)
eng_dt = time.perf_counter() - t0
eng_rate = REPS * BATCH / eng_dt

print(f"width={width} col_chunk={col_chunk} dtype={dt_} batch={BATCH}: "
      f"halo {halo_rate:.3f} panos/s vs engine {eng_rate:.3f} panos/s "
      f"-> ratio {eng_rate / halo_rate:.2f}x")
