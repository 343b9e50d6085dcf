"""steps_per_call sweep: measured per-iteration wall time of the K-steps-
per-device-call training program (train_params.steps_per_call), including
host dispatch — the production loop's actual sustained rate.

Motivation: the round-3 5k run sustained 4.9 it/s between log ticks while
the compiled amortized program time is 134.2 ms (7.45 it/s) — ~70 ms/iter
of per-dispatch overhead through the remote-attached runtime.  Folding K
steps into one executable launch (make_train_step_many, exact-equivalence
tested in tests/test_train_step.py) amortizes that.

Usage: python tools/bench_steps_per_call.py [config] [K ...]
       (default spgan_run5k.yaml, K in 1 2 4 8)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spgan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    from spgan_tpu.config import load_config
    from spgan_tpu.models.discriminator import Discriminator
    from spgan_tpu.models.generator import Generator
    from spgan_tpu.train.state import create_train_state
    from spgan_tpu.train.step import make_train_step_many
    from spgan_tpu.utils.misc import sync_fetch

    args = sys.argv[1:]
    cfg_path = args[0] if args else "configs/model/spgan_run5k.yaml"
    ks = [int(a) for a in args[1:]] or [1, 2, 4, 8]
    cfg = load_config(cfg_path)
    tp = cfg.train_params

    g = Generator.from_config(cfg)
    d = Discriminator.from_config(cfg)
    state0 = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = tp.patch_size
    key = jax.random.PRNGKey(1)

    step_many = make_train_step_many(cfg, g, d)
    for k in ks:
        patches = jnp.asarray(rng.randn(
            k, tp.batch_size, b, b, 3).astype(np.float32))
        acs = jnp.asarray(rng.uniform(
            -1, 1, (k, tp.batch_size, 3)).astype(np.float32))
        # plain windows only: the reg phases add the same amortized work at
        # any K (lazy cadence), while mixing them in would give different-K
        # windows different per-iter work; dispatch amortization — the thing
        # under test — is phase-independent
        r1s = (False,) * k
        ppls = (False,) * k
        state, m = step_many(state0, patches, acs, key,
                             do_r1=r1s, do_ppl=ppls)
        sync_fetch(m)  # host value fetch = the only reliable barrier
        outer = max(1, 16 // k)  # ~16 iterations per timed window
        t0 = time.perf_counter()
        for j in range(outer):
            state, m = step_many(state, patches, acs,
                                 jax.random.fold_in(key, j),
                                 do_r1=r1s, do_ppl=ppls)
        sync_fetch(m)
        dt = (time.perf_counter() - t0) / (outer * k)
        print(f"K={k}: {dt*1000:7.2f} ms/iter ({1/dt:5.2f} it/s, "
              f"batch {tp.batch_size}, {outer} calls timed)")


if __name__ == "__main__":
    main()
