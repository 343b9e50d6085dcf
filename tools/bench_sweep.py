import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, jax
from spgan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from spgan_tpu.config import Config
from spgan_tpu.infer.engine import PanoramaEngine
from spgan_tpu.infer.stitcher import build_close_loop_plan
from spgan_tpu.models.generator import Generator

chunk = int(sys.argv[1]); dt_ = sys.argv[2] if len(sys.argv)>2 else "bfloat16"
cfg = Config()
g = Generator.from_config(cfg)
params = g.init(jax.random.PRNGKey(0))
plan = build_close_loop_plan(g, 384, 768)
eng = PanoramaEngine(g=g, plan=plan, batch=16, patch_chunk=chunk,
                     grid_partial=cfg.train_params.partial, compute_dtype=dt_)
from spgan_tpu.utils.misc import sync_fetch  # the only reliable barrier
t0=time.perf_counter()
m = eng.generate(params, jax.random.PRNGKey(1)); sync_fetch(m)
print(f"compile+1st: {time.perf_counter()-t0:.1f}s")
t0=time.perf_counter()
for i in range(4):
    m = eng.generate(params, jax.random.PRNGKey(2+i))
sync_fetch(m)
dt = time.perf_counter()-t0
print(f"chunk={chunk} dtype={dt_}: {4*16/dt:.3f} panos/s ({dt/4/16*1000:.1f} ms/pano)")
