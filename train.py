#!/usr/bin/env python
"""Train SP-GAN (TPU-native). Reference-compatible CLI surface:

    python train.py configs/model/spgan.yaml [--debug] [--seed N]

--debug runs exactly one full training iteration and writes nothing to disk
(the reference's de-facto smoke test, train.py:57-62,721-722).
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="model yaml (reference spgan.yaml layout)")
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--baseline-ckpt", default=None,
                    help="transfer-learn from an InfinityGAN baseline ckpt "
                         "(reference --baseline_dir)")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address host:port")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler device trace (XPlane, for "
                         "TensorBoard/xprof) into this directory")
    ap.add_argument("--profile-start", type=int, default=3,
                    help="first traced iteration, relative to loop start "
                         "(default 3: skips compile + warmup)")
    ap.add_argument("--profile-iters", type=int, default=5,
                    help="number of iterations in the trace window")
    args = ap.parse_args()

    from spgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spgan_tpu.config import load_config
    from spgan_tpu.train.loop import train

    if args.num_processes:
        from spgan_tpu.parallel.mesh import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    cfg = load_config(args.config)
    if args.debug:
        cfg.train_params.batch_size = min(cfg.train_params.batch_size, 8)
    train(cfg, debug=args.debug, seed=args.seed, max_iters=args.max_iters,
          baseline_ckpt=args.baseline_ckpt, profile_dir=args.profile_dir,
          profile_start=args.profile_start, profile_iters=args.profile_iters)


if __name__ == "__main__":
    main()
