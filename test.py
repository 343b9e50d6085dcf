#!/usr/bin/env python
"""Inference driver. Reference-compatible CLI surface (reference test.py):

    python test.py --model-config configs/model/spgan.yaml \
                   --test-config configs/test/spgan_384x768.yaml \
                   [--ckpt PATH] [--random-init] [--speed-benchmark] \
                   [--calc-flops] [--inter-ckpt PATH] [--save_all_space] \
                   [--num-gen N] [--seed S] [--save-root DIR] [--exp-suffix S]

Without --ckpt (or with --random-init) the generator runs with fresh random
weights (useful for speed benchmarking / smoke tests; image quality obviously
requires a trained checkpoint — use spgan_tpu.compat.load.load_generator_params
to convert the released SP-GAN.ckpt, or point --ckpt at a spgan_tpu training
checkpoint directory).
"""
import argparse
import glob
import json
import os
import shutil
import socket
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-config", required=True)
    ap.add_argument("--test-config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir or converted .npz params")
    ap.add_argument("--random-init", action="store_true",
                    help="skip checkpoint loading, use initialized weights "
                         "(reference test.py:326-328)")
    ap.add_argument("--exp-suffix", default=None,
                    help="suffix appended to the save directory name "
                         "(reference test.py:202)")
    ap.add_argument("--override-save-idx", type=int, default=None,
                    help="start the saved-image global id here "
                         "(reference test.py:137,208-209 -> task.init_index)")
    ap.add_argument("--speed-benchmark", action="store_true")
    ap.add_argument("--calc-flops", action="store_true")
    ap.add_argument("--num-gen", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--save-root", default=None)
    ap.add_argument("--inv-records", default=None,
                    help="colon-separated inversion record files (.npz from "
                         "invert_patch) pasted into the latent fields "
                         "(reference --inv-records, test.py:172-180)")
    ap.add_argument("--inv-placements", default=None,
                    help="comma-separated horizontal centers in [0,1], one "
                         "per record (default 0.5)")
    ap.add_argument("--inter-ckpt", default=None, metavar="PATH",
                    help="load saved TestingVars (.npz file, or a directory "
                         "of them — one per iteration) and regenerate from "
                         "them (reference test.py:69-74)")
    ap.add_argument("--dump-vars", action="store_true",
                    help="dump TestingVars (.npz) next to each saved batch "
                         "(producer side of --inter-ckpt)")
    ap.add_argument("--save_all_space", action="store_true",
                    help="additionally save the uncropped meta image as "
                         "<id>full.png (reference close_loop:35-46)")
    ap.add_argument("--clear-fid-cache", action="store_true",
                    help="remove the cached real-dataset FID statistics "
                         "(.fid-cache/) before running")
    ap.add_argument("--engine", default=None,
                    choices=["folded", "sharded", "halo"],
                    help="override task.engine: folded (single-device "
                         "one-jit lattice), sharded (lattice positions "
                         "shard_map'ed over the mesh), halo (width-sharded "
                         "fields + ppermute halo ring)")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler device trace (XPlane, for "
                         "TensorBoard/xprof) of one generation batch — the "
                         "second batch when more than one runs (the first "
                         "pays compilation), else the only one")
    ap.add_argument("--interactive", action="store_true",
                    help="line-oriented editing REPL over the TestingVars "
                         "primitives (reference test.py:136 parses this flag "
                         "but ships no consumer; see infer/interactive.py)")
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    from spgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spgan_tpu.config import load_config
    from spgan_tpu.utils.misc import import_func, manually_seed

    cfg = load_config(args.model_config, args.test_config)
    if args.interactive:
        cfg.task.interactive = True
    if args.num_gen is not None:
        cfg.task.num_gen = args.num_gen
    if args.override_save_idx is not None:
        cfg.task.init_index = args.override_save_idx
    if args.engine is not None:
        cfg.task.engine = args.engine
    seed = args.seed if args.seed is not None else cfg.task.seed
    manually_seed(seed)

    if args.clear_fid_cache and os.path.isdir(".fid-cache"):
        shutil.rmtree(".fid-cache")
        print(" [*] Cleared .fid-cache/")

    g = import_func(cfg.train_params.g_arch).from_config(cfg)

    if args.ckpt is None or args.random_init:
        params_ema = g.init(jax.random.PRNGKey(seed))
        print(" [!] Using randomly initialized weights"
              + (" (--random-init)" if args.random_init else " (no --ckpt)"))
    else:
        from spgan_tpu.compat.load import load_generator_params

        params_ema = load_generator_params(args.ckpt, g)

    if args.calc_flops:
        from spgan_tpu.utils.flops import generator_flops, pretty

        fl = generator_flops(g)
        n_patches = 60  # 384x768 close-loop lattice
        print(" [*] FLOPs per patch: all {} (SS {}, TS {})".format(
            pretty(fl["flops_all"]), pretty(fl["flops_ss"]),
            pretty(fl["flops_ts"])))
        print(" [*] FLOPs per 384x768 pano ({} patches): {}".format(
            n_patches, pretty(fl["flops_all"] * n_patches)))
        return

    test_name = os.path.splitext(os.path.basename(args.test_config))[0]
    if args.exp_suffix:
        test_name = f"{test_name}_{args.exp_suffix}"
    save_root = args.save_root or os.path.join(
        cfg.log_dir, cfg.exp_name, "test", test_name)

    manager_cls = import_func(cfg.task.task_manager)
    # save_root is kept in benchmark mode too: run_next(save=False) skips the
    # image writes but the per-day speed_benchmark_<date>.txt files land next
    # to the outputs like the reference's (close_loop:292-299)
    manager = manager_cls(g=g, params_ema=params_ema, config=cfg,
                          save_root=save_root)
    manager.task_specific_init(seed=seed)

    if cfg.task.interactive:
        from spgan_tpu.infer.interactive import run_interactive

        assert cfg.task.batch_size == 1, (
            "interactive editing expects batch_size 1 (reference "
            "close_loop_infinite_generation.py:340-344)")
        n = run_interactive(manager, save_root)
        print(f" [*] interactive session done — {n} image(s) in {save_root}")
        return

    batch = cfg.task.batch_size
    num_gen = 1 if args.debug else cfg.task.num_gen
    n_batches = max(1, (num_gen + batch - 1) // batch)
    key = jax.random.PRNGKey(seed)

    inv_records = None
    if args.inv_records:
        inv_records = []
        for path in args.inv_records.split(":"):
            data = np.load(path)
            rec = {"local_latent": data["z"][0],
                   "noises": [data[k] [0] for k in sorted(data.files)
                              if k.startswith("noise")]}
            if "gz" in data.files:
                rec["global_latent"] = data["gz"]
            inv_records.append(rec)
        if args.inv_placements:
            placements = [float(v) for v in args.inv_placements.split(",")]
        else:
            placements = [0.5] * len(inv_records)

    # --inter-ckpt: a single file applies to every iteration; a directory is
    # a sorted list consumed one file per iteration (reference test.py:69-74)
    inter_ckpt_paths = None
    if args.inter_ckpt:
        if os.path.isfile(args.inter_ckpt):
            print(" [!] A single inter ckpt is loaded for all samples!")
            inter_ckpt_paths = [args.inter_ckpt] * n_batches
        else:
            inter_ckpt_paths = sorted(
                glob.glob(os.path.join(args.inter_ckpt, "*.npz")))
            assert inter_ckpt_paths, \
                f"no .npz TestingVars found under {args.inter_ckpt}"
            n_batches = min(n_batches, len(inter_ckpt_paths))

    from spgan_tpu.infer.managers import save_image_batch
    from spgan_tpu.infer.testing_vars import TestingVars

    profile_batch = None
    if args.profile_dir is not None:
        profile_batch = 1 if n_batches > 1 else 0

    prof_on = False
    try:
        for i in range(n_batches):
            if i == profile_batch:
                jax.profiler.start_trace(args.profile_dir)
                prof_on = True
            if cfg.task.seeds:
                # per-BATCH seeds: batch i is reproducible from PRNGKey(i)
                # regardless of how many batches ran before. (The reference's
                # task.seeds computes seeds=range(num_gen) and assigns
                # seed=seeds[iter_] per batch iteration without ever using it —
                # test.py:77-83; this keys the batch RNG instead, which is the
                # evidently intended behavior.)
                k = jax.random.PRNGKey(i)
            else:
                key, k = jax.random.split(key)
            if inter_ckpt_paths is not None:
                tv = TestingVars.load(inter_ckpt_paths[i])
                out = manager.generate_with_vars(tv)
                cropped = np.asarray(manager.engine.crop_to_target(out))
                save_image_batch(cropped, save_root, manager.cur_global_id)
                manager.cur_global_id += cropped.shape[0]
            elif inv_records is not None:
                tv = manager.create_vars(k)
                tv.replace_by_records(manager.engine.plan, inv_records,
                                      placements)
                out = manager.generate_with_vars(tv)
                cropped = np.asarray(manager.engine.crop_to_target(out))
                save_image_batch(cropped, save_root, manager.cur_global_id)
                manager.cur_global_id += cropped.shape[0]
            elif args.dump_vars:
                tv = manager.create_vars(k)
                out = manager.generate_with_vars(tv)
                os.makedirs(save_root, exist_ok=True)
                tv.save(os.path.join(save_root,
                                     f"{manager.cur_global_id:06d}_vars.npz"))
                cropped = np.asarray(manager.engine.crop_to_target(out))
                save_image_batch(cropped, save_root, manager.cur_global_id)
                manager.cur_global_id += cropped.shape[0]
            else:
                manager.run_next(k, save=not args.speed_benchmark,
                                 write_gpu_time=args.speed_benchmark)
            if args.save_all_space and not args.speed_benchmark:
                manager.save_full_imgs()
            if i == profile_batch:
                # the save paths above fetch the meta image to the host, so the
                # device work of this batch is inside the window
                jax.profiler.stop_trace()
                prof_on = False
                print(f" [*] Profiler trace written to {args.profile_dir}")
            if args.debug:
                break
    finally:
        if prof_on:
            # the traced batch raised (or was interrupted): close the
            # trace so the partial XPlane file is still written
            jax.profiler.stop_trace()

    if args.speed_benchmark:
        mean, std = manager.get_exec_time_stats()
        per_img = mean / batch
        host = socket.gethostname()
        out_dir = os.path.join("logs-quant", "benchmark_results")
        os.makedirs(out_dir, exist_ok=True)
        line = (f"{cfg.exp_name}: {per_img:.6f} +/- {std / batch:.6f} "
                f"sec/image (batch {batch}, {len(manager.accum_exec_times)}"
                f" calls)")
        with open(os.path.join(out_dir, f"benchmark-{host}.txt"), "a") as f:
            f.write(line + "\n")
        print(" [*] " + line)

    manager.exit()


if __name__ == "__main__":
    main()
