"""A/B the Pallas training sampler vs the XLA gather path on the real chip.

Timing method: fetch a scalar metric to the host every iteration.  On this
remote-attached runtime block_until_ready() returns early (measured
"8 ms/iter" for a step whose math lower-bounds at ~50 ms), so only
value-fetch timings are trustworthy.

Usage: python tools/bench_sampler.py [on|off] [iters] [float32|bfloat16]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from spgan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from spgan_tpu.config import Config
from spgan_tpu.models.discriminator import Discriminator
from spgan_tpu.models.generator import Generator
from spgan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from spgan_tpu.train.state import create_train_state
from spgan_tpu.train.step import make_train_step

mode = sys.argv[1] if len(sys.argv) > 1 else "off"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
cfg = Config()
tp = cfg.train_params
tp.pallas_train_sampler = mode
tp.compute_dtype = dtype
g = Generator.from_config(cfg)
d = Discriminator.from_config(cfg)
mesh = make_mesh()
state = replicate(create_train_state(cfg, g, d, jax.random.PRNGKey(0)), mesh)
rng = np.random.RandomState(0)
real = shard_batch(jnp.asarray(
    rng.randn(tp.batch_size, 101, 101, 3).astype(np.float32)), mesh)
ac = shard_batch(jnp.asarray(
    rng.uniform(-1, 1, (tp.batch_size, 3)).astype(np.float32)), mesh)
step = make_train_step(cfg, g, d)

for name, r1, ppl in (("plain", False, False), ("r1+ppl", True, True)):
    t0 = time.perf_counter()
    s2, m = step(state, real, ac, jax.random.PRNGKey(1), do_r1=r1, do_ppl=ppl)
    _ = float(m["g_total_loss"])
    print(f"[{mode}/{dtype}] {name}: compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        s2, m = step(s2, real, ac, jax.random.PRNGKey(2 + i),
                     do_r1=r1, do_ppl=ppl)
        _ = float(m["g_total_loss"])  # host fetch == real sync point
    dt = (time.perf_counter() - t0) / iters
    print(f"[{mode}/{dtype}] {name}: {dt*1000:.1f} ms/iter "
          f"({1/dt:.2f} it/s, batch {tp.batch_size})", flush=True)
