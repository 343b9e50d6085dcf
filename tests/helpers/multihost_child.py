"""Child process for the 2-process multi-host training test.

Usage: python multihost_child.py <coordinator> <num_procs> <pid> <out.npz>

Each process owns 4 virtual CPU devices; the two processes form one 8-device
global `data` mesh running the SAME pjit train-step program (SURVEY §2.3:
"multi-host jax.distributed + same pjit program").  Each host feeds only its
local shard of the global batch (jax.make_array_from_process_local_data).
Afterwards every process dumps a digest of the (replicated) updated params —
the parent asserts the digests match across processes, proving the gradient
all-reduce spanned hosts.
"""
import os
import sys

coordinator, n_proc, pid, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from spgan_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402

init_distributed(coordinator, n_proc, pid)
assert jax.process_count() == n_proc
assert jax.device_count() == 4 * n_proc
assert jax.local_device_count() == 4

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from spgan_tpu.config import Config  # noqa: E402
from spgan_tpu.models.discriminator import Discriminator  # noqa: E402
from spgan_tpu.models.generator import Generator  # noqa: E402
from spgan_tpu.train.state import create_train_state  # noqa: E402
from spgan_tpu.train.step import make_train_step  # noqa: E402

cfg = Config()
tp = cfg.train_params
tp.global_latent_dim = 16
tp.local_latent_dim = 8
tp.channel_multiplier = 1
tp.n_mlp = 1
tp.ss_n_layers = 1
tp.batch_size = 8  # global batch; 4 per host
tp.path_batch_shrink = 2

g = Generator.from_config(cfg)
object.__setattr__(g.ts, "channel_base", 16)
d = Discriminator(patch_size=tp.patch_size, channel_multiplier=1,
                  batch_size=tp.batch_size, use_coord_ac=True,
                  coord_num_dir=3, linear_ch=16)
small = {k: 16 for k in (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)}
object.__setattr__(d, "channels", lambda: small)

mesh = make_mesh()  # all 8 global devices
batch_sh = NamedSharding(mesh, P("data"))
rep_sh = NamedSharding(mesh, P())

# identical seed on every process -> identical initial (replicated) params
state = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
state = jax.tree_util.tree_map(
    lambda x: jax.make_array_from_process_local_data(rep_sh, np.asarray(x)),
    state)

# every process materializes the SAME global batch and contributes its
# local shard of it
rng = np.random.RandomState(7)
real_patch_global = rng.randn(tp.batch_size, tp.patch_size, tp.patch_size,
                              3).astype(np.float32)
real_ac_global = rng.uniform(-1, 1, (tp.batch_size, 3)).astype(np.float32)
lo = pid * 4
real_patch = jax.make_array_from_process_local_data(
    batch_sh, real_patch_global[lo:lo + 4], real_patch_global.shape)
real_ac = jax.make_array_from_process_local_data(
    batch_sh, real_ac_global[lo:lo + 4], real_ac_global.shape)

step = make_train_step(cfg, g, d)
new_state, metrics = step(state, real_patch, real_ac, jax.random.PRNGKey(1),
                          do_r1=False, do_ppl=False)
jax.block_until_ready(new_state)

# digest: per-leaf float64 sums of the updated generator params (replicated,
# so fully addressable on every host)
leaves = jax.tree_util.tree_leaves(new_state.params_g)
digest = np.array([float(np.asarray(x, np.float64).sum()) for x in leaves])
mets = {k: float(v) for k, v in metrics.items()}
np.savez(out_path, digest=digest,
         metric_names=np.array(sorted(mets)),
         metric_vals=np.array([mets[k] for k in sorted(mets)]))
print(f"proc {pid} OK, {len(leaves)} leaves")
