"""Measure ONE production-scale FID eval tick on the attached accelerator
(VERDICT r2 next-round #4): n_fid_sample generated + n_fid_sample real
patches through the JAX InceptionV3 (reference libs/fid.py:59-122,214-276;
tick cadence train.py:641-668).

Inception weights are random-valued but real-structure (InceptionV3FID.init)
— the FID number is meaningless, the computation (resize -> inception ->
stats -> Frechet) is the real protocol.  Reports:

  * cold tick: real-stats computation + cache write + fake pass
  * warm tick: cached real stats + fake pass   <- the recurring cost
  * device peak memory after the tick

Usage: python tools/bench_fid_tick.py [n_sample] (default: config value)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from spgan_tpu.config import load_config
    from spgan_tpu.data.pipeline import make_train_pipeline
    from spgan_tpu.evalkit.inception import InceptionV3FID
    from spgan_tpu.models.generator import Generator
    from spgan_tpu.train.evals import TrainFID
    from spgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config("configs/model/spgan_run5k.yaml")
    if not os.path.exists(cfg.data_params.folder):
        cfg.data_params.source = "synthetic"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else \
        cfg.test_params.n_fid_sample

    g = Generator.from_config(cfg)
    params = g.init(jax.random.PRNGKey(0))
    inc = InceptionV3FID().init(jax.random.PRNGKey(1))
    pipe = make_train_pipeline(cfg, seed=0, include_full=False)

    fid = TrainFID(cfg, g, pipe, inception_params=inc)
    dev = jax.devices()[0]

    # cold: computes + caches the real stats, then the fake pass
    t0 = time.perf_counter()
    v_cold = fid(params, jax.random.PRNGKey(2), n_sample=n)
    cold_s = time.perf_counter() - t0

    # warm: the recurring per-tick cost at eval_tick cadence
    t0 = time.perf_counter()
    v_warm = fid(params, jax.random.PRNGKey(3), n_sample=n)
    warm_s = time.perf_counter() - t0

    stats = dev.memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    out = {
        "n_sample": n,
        "batch_size": cfg.train_params.batch_size,
        "fid_cold_s": round(cold_s, 2),
        "fid_warm_s": round(warm_s, 2),
        "fid_value_random_weights": round(float(v_warm), 4),
        "fid_value_cold": round(float(v_cold), 4),
        "device_peak_bytes": int(peak),
        "device_peak_gib": round(peak / 2**30, 3),
        "platform": dev.platform,
    }
    print(json.dumps(out))
    pipe.close()


if __name__ == "__main__":
    main()
