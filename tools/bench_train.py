"""Training-step throughput on the real chip (full-size model, batch 16)."""
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

cfg = Config()
tp = cfg.train_params
g = Generator.from_config(cfg)
d = Discriminator.from_config(cfg)
mesh = make_mesh()
state = replicate(create_train_state(cfg, g, d, jax.random.PRNGKey(0)), mesh)
rng = np.random.RandomState(0)
real = shard_batch(jnp.asarray(rng.randn(tp.batch_size, 101, 101, 3).astype(np.float32)), mesh)
ac = shard_batch(jnp.asarray(rng.uniform(-1, 1, (tp.batch_size, 3)).astype(np.float32)), mesh)
step = make_train_step(cfg, g, d)
from spgan_tpu.utils.misc import sync_fetch  # the only reliable barrier

for name, r1, ppl in (("plain", False, False), ("r1", True, False), ("r1+ppl", True, True)):
    t0 = time.perf_counter()
    s2, m = step(state, real, ac, jax.random.PRNGKey(1), do_r1=r1, do_ppl=ppl)
    sync_fetch(m)
    print(f"{name}: compile+1st {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(10):
        s2, m = step(s2, real, ac, jax.random.PRNGKey(2+i), do_r1=r1, do_ppl=ppl)
        sync_fetch(m)
    dt = (time.perf_counter()-t0)/10
    print(f"{name}: {dt*1000:.1f} ms/iter ({1/dt:.2f} it/s, batch {tp.batch_size})")
