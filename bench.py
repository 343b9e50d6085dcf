"""Benchmark: 384x768 closed-loop panorama generation throughput on the
available accelerator (the reference's canonical eval task,
configs/test/spgan_384x768.yaml: batch 16; the reference makes 60 generator
calls per panorama — this engine renders the 48 distinct patches and reuses
the bit-identical wrap-column renders, see infer/engine.py dedup_wrap).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: measured ratio against the reference implementation running on
the CPU of this box (the reference publishes no numbers, BASELINE.md). The
denominator comes from BASELINE_cpu.json, produced by
tools/bench_reference_cpu.py — the ACTUAL reference generator + close-loop
manager at /root/reference with --random-init --speed-benchmark semantics.
If the file is absent, vs_baseline is null rather than fabricated.
"""
import json
import os
import sys
import time


def main():
    from spgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from spgan_tpu.config import Config
    from spgan_tpu.infer.engine import PanoramaEngine
    from spgan_tpu.infer.stitcher import build_close_loop_plan
    from spgan_tpu.models.generator import Generator
    from spgan_tpu.utils.misc import sync_fetch

    cfg = Config()
    batch = cfg.task.batch_size  # 16
    g = Generator.from_config(cfg)
    params = g.init(jax.random.PRNGKey(0))

    # opt-out ablation knob (tools A/B; the driver runs plain `python bench.py`)
    skip_tables = "--no-skip-tables" not in sys.argv

    plan = build_close_loop_plan(g, cfg.task.height, cfg.task.width)
    engine = PanoramaEngine(
        g=g, plan=plan, batch=batch, patch_chunk=cfg.task.patch_chunk,
        grid_partial=cfg.train_params.partial,
        compute_dtype="bfloat16", use_skip_tables=skip_tables)

    # warmup / compile; sync_fetch = host value fetch, the only trustworthy
    # completion barrier on the remote axon runtime (utils.misc.sync_fetch)
    meta = engine.generate(params, jax.random.PRNGKey(1))
    sync_fetch(meta)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        meta = engine.generate(params, jax.random.PRNGKey(2 + i))
    sync_fetch(meta)
    dt = time.perf_counter() - t0

    panos = iters * batch
    panos_per_sec = panos / dt

    baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_cpu.json")
    vs_baseline = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            ref = json.load(f)
        if ref.get("panos_per_sec"):
            vs_baseline = round(panos_per_sec / ref["panos_per_sec"], 2)

    print(json.dumps({
        "metric": "closeloop_pano_384x768_throughput",
        "value": round(panos_per_sec, 4),
        "unit": "panoramas/sec/chip",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
