"""Training-step roofline (VERDICT r2 weak #2 / next-round #6): per-phase
wall times and a TF/s utilization number for the real spgan config
(reference hot loop train.py:200-415).

Decomposition — the production step compiles one XLA program per static
(do_r1, do_ppl) combination, so phase costs come from timing the four
variants of the REAL program (not re-jitted sub-functions, which would fuse
differently):

    base          = step(do_r1=F, do_ppl=F)       # D + G + EMA
    r1_cost       = step(T, F) - base             # lazy R1 (double grad, D)
    ppl_cost      = step(F, T) - base             # lazy PPL (double grad, G)
    amortized     = base + r1_cost/d_reg_every + ppl_cost/g_reg_every

plus XLA's own FLOP count for each variant (compiled.cost_analysis) giving
sustained TF/s against the measured matmul ceiling (tools/bench_kernel.py:
~141 TF/s bf16 on this chip).

Usage: python tools/bench_train_phases.py [config] (default spgan_run5k)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spgan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def _force(out):
    from spgan_tpu.utils.misc import sync_fetch

    return sync_fetch(out)  # host value fetch = the only reliable barrier


def timeit(fn, *args, iters=20, **kw):
    _force(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    from spgan_tpu.config import load_config
    from spgan_tpu.models.discriminator import Discriminator
    from spgan_tpu.models.generator import Generator
    from spgan_tpu.train.state import create_train_state
    from spgan_tpu.train.step import make_train_step

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else \
        "configs/model/spgan_run5k.yaml"
    cfg = load_config(cfg_path)
    tp = cfg.train_params

    g = Generator.from_config(cfg)
    d = Discriminator.from_config(cfg)
    state = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = tp.batch_size
    patch = jnp.asarray(rng.randn(b, tp.patch_size, tp.patch_size, 3)
                        .astype(np.float32))
    ac = jnp.asarray(rng.uniform(-1, 1, (b, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    step = make_train_step(cfg, g, d)

    res = {}
    flops = {}
    for name, (r1, ppl) in {
            "base": (False, False), "r1": (True, False),
            "ppl": (False, True), "full": (True, True)}.items():
        t = timeit(lambda: step(state, patch, ac, key, do_r1=r1,
                                do_ppl=ppl)[1])
        res[name] = t
        try:
            comp = step.lower(state, patch, ac, key, do_r1=r1,
                              do_ppl=ppl).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops[name] = float(ca.get("flops", float("nan")))
        except Exception:
            flops[name] = float("nan")

    d_reg, g_reg = tp.d_reg_every, tp.g_reg_every
    r1_extra = res["r1"] - res["base"]
    ppl_extra = res["ppl"] - res["base"]
    amort = res["base"] + r1_extra / d_reg + ppl_extra / g_reg
    amort_flops = flops["base"] + \
        (flops["r1"] - flops["base"]) / d_reg + \
        (flops["ppl"] - flops["base"]) / g_reg

    out = {
        "config": os.path.basename(cfg_path),
        "batch_size": b,
        "compute_dtype": tp.compute_dtype,
        "platform": jax.devices()[0].platform,
        "ms": {k: round(v * 1e3, 2) for k, v in res.items()},
        "extra_ms": {"r1": round(r1_extra * 1e3, 2),
                     "ppl": round(ppl_extra * 1e3, 2)},
        "amortized_ms_per_iter": round(amort * 1e3, 2),
        "gflops": {k: round(v / 1e9, 1) for k, v in flops.items()},
        "sustained_tflops_amortized": round(amort_flops / amort / 1e12, 2),
        "iters_800k_chip_days": round(amort * 800_000 / 86400, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
