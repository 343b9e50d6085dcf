"""Training driver: the reference train.py main loop re-shaped around one
jitted step.

Parity surface (reference train.py):
  * lazy R1 every d_reg_every, lazy PPL every g_reg_every after g_path_start
    (:288,384)
  * tensorboard scalars/breakdowns every log_tick (:438-452), image grids
    every img_tick (:463-622 — random + EMA samples), rolling ckpts every
    save_tick (:627-639), FID every eval_tick (:641-668, requires inception
    weights — skipped with a warning otherwise)
  * --debug: one full iteration, nothing written to disk (:57-62,721-722)
  * error log to logs/<exp>/error-log.txt (:1033-1047)
"""
from __future__ import annotations

import dataclasses
import os
import time
import traceback
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.models.discriminator import Discriminator
from spgan_tpu.models.generator import Generator
from spgan_tpu.models.latents import LatentSampler
from spgan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from spgan_tpu.train.checkpoint import CheckpointManager
from spgan_tpu.train.state import TrainState, create_train_state
from spgan_tpu.train.step import make_train_step


def crossed_tick(it: int, adv: int, n: int) -> bool:
    """Boundary-crossing tick: with steps_per_call > 1 the loop advances by
    `adv` iterations per device call, so exact-modulo ticks (`it % n == 0`)
    can be skipped permanently when adv does not divide n.  Fires once
    whenever the half-open span (it-adv, it] straddles a multiple of n."""
    return (it // n) > ((it - adv) // n)


def _to_grid(imgs: np.ndarray, ncol: int = 8) -> np.ndarray:
    """(B,H,W,3) in [-1,1] -> one (H*r, W*ncol, 3) uint8 grid."""
    b, h, w, c = imgs.shape
    ncol = min(ncol, b)
    nrow = (b + ncol - 1) // ncol
    canvas = np.zeros((nrow * h, ncol * w, c), np.float32)
    for i in range(b):
        r, cidx = divmod(i, ncol)
        canvas[r * h:(r + 1) * h, cidx * w:(cidx + 1) * w] = imgs[i]
    canvas = np.clip((canvas + 1) / 2, 0, 1)
    return (canvas * 255).astype(np.uint8)


def train(cfg: Config, debug: bool = False, seed: int = 0,
          max_iters: Optional[int] = None,
          baseline_ckpt: Optional[str] = None,
          profile_dir: Optional[str] = None, profile_start: int = 3,
          profile_iters: int = 5) -> TrainState:
    tp = cfg.train_params
    exp_root = os.path.join(cfg.log_dir, cfg.exp_name)

    writer = None
    ckpt_mgr = None
    if not debug:
        os.makedirs(exp_root, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(exp_root, "tb"))
        except Exception:
            writer = None
        ckpt_mgr = CheckpointManager(os.path.join(exp_root, "ckpt"))
        try:  # source snapshot (reference libs/backup.py, train.py:66-68)
            from spgan_tpu.utils.misc import backup_files

            backup_files(os.getcwd(), os.path.join(exp_root, "codes"))
        except Exception:
            pass

    # architecture classes chosen by dotted-path config strings, like the
    # reference's import_func(g_arch) (train.py:797-799, utils.py:293-297)
    from spgan_tpu.utils.misc import import_func

    g = import_func(tp.g_arch).from_config(cfg)
    d = import_func(tp.d_arch).from_config(cfg)

    mesh = make_mesh()
    base_key = jax.random.PRNGKey(seed)
    state = create_train_state(cfg, g, d,
                               jax.random.fold_in(base_key, 2 ** 31))

    freeze_g_mask = None
    if baseline_ckpt is not None:
        # transfer learning from an InfinityGAN baseline ckpt
        # (reference train.py:884-957); with train_params.freeze the loaded
        # G keys (and the whole D) stop updating (:959-978)
        import torch

        from spgan_tpu.compat.baseline import import_torch_baseline_generator

        raw = torch.load(baseline_ckpt, map_location="cpu",
                         weights_only=False)
        sd = raw.get("g_ema", raw.get("g", raw))
        params_g, mask = import_torch_baseline_generator(sd, g,
                                                         state.params_g)
        state = dataclasses.replace(
            state, params_g=params_g,
            params_g_ema=jax.tree_util.tree_map(jnp.copy, params_g))
        if tp.freeze:
            freeze_g_mask = mask
        n_loaded = sum(jax.tree_util.tree_leaves(mask))
        print(f" [*] Baseline transfer: {n_loaded} tensors loaded"
              f"{' (frozen)' if tp.freeze else ''}")

    start_iter = 0
    if ckpt_mgr is not None and ckpt_mgr.latest_step() is not None:
        state, _ = ckpt_mgr.restore(state)
        start_iter = int(state.step)
        print(f" [*] Resumed from iter {start_iter}")
    state = replicate(state, mesh)

    k_steps = max(1, tp.steps_per_call)
    if k_steps > 1:
        from spgan_tpu.train.step import make_train_step_many

        step_fn_many = make_train_step_many(cfg, g, d,
                                            freeze_g_mask=freeze_g_mask)
    step_fn = make_train_step(cfg, g, d, freeze_g_mask=freeze_g_mask)

    from spgan_tpu.data.pipeline import make_train_pipeline

    pipeline = make_train_pipeline(cfg, seed=seed)

    # fixed latents for visualization (train.py:125-128)
    sampler = LatentSampler(global_dim=tp.global_latent_dim,
                            local_dim=tp.local_latent_dim,
                            ts_input_size=tp.ts_input_size,
                            ss_unfold_size=tp.ss_unfold_size,
                            mixing=tp.mixing)
    kvis = jax.random.PRNGKey(seed + 1)
    n_vis = min(cfg.log_params.n_save_sample, 16)
    vis_gl = sampler.sample_global(jax.random.fold_in(kvis, 0), n_vis,
                                   mixing=False)
    vis_ll = sampler.sample_local(jax.random.fold_in(kvis, 1), n_vis)

    @jax.jit
    def vis_forward(params_ema, kc):
        coords, _, cp = g.ss.coord_grid.sample_training(kc, n_vis)
        out = g.apply(params_ema, global_latent=vis_gl, local_latent=vis_ll,
                      coords=coords, cp=cp,
                      noise_rng=jax.random.fold_in(kvis, 2))
        return out["gen"]

    # diversity grids (reference train.py:468-622): style diversity = one
    # local latent under several globals; structure diversity = one global
    # under several locals
    @jax.jit
    def vis_diversity(params_ema, kc):
        n = min(n_vis, 8)
        coords, _, cp = g.ss.coord_grid.sample_training(kc, n)
        style_div = g.apply(
            params_ema,
            global_latent=sampler.sample_global(jax.random.fold_in(kc, 1), n,
                                                mixing=False),
            local_latent=jnp.tile(vis_ll[:1], (n, 1, 1, 1)),
            coords=coords, cp=cp,
            noise_rng=jax.random.fold_in(kvis, 5))["gen"]
        struct_div = g.apply(
            params_ema,
            global_latent=jnp.tile(vis_gl[:1], (n, 1, 1)),
            local_latent=sampler.sample_local(jax.random.fold_in(kc, 2), n),
            coords=coords, cp=cp,
            noise_rng=jax.random.fold_in(kvis, 6))["gen"]
        return style_div, struct_div

    # extended visualization grids (reference train.py:128-147,595-622):
    # ext_mult_list is [] above patch 512, [2] above 256, [] when no_ext,
    # else [2, 4]
    if tp.patch_size > 512:
        ext_mult_list = []
    elif tp.patch_size > 256:
        ext_mult_list = [2]
    elif tp.no_ext:
        ext_mult_list = []
    else:
        ext_mult_list = [2, 4]
    def _make_ext_forward(mult):
        ll_ext = sampler.sample_local(jax.random.fold_in(kvis, 2 + mult),
                                      n_vis, spatial_size_enlarge=mult)

        @jax.jit
        def fwd(params_ema, kc):
            coords, _, cp = g.ss.coord_grid.sample_training_extrap(
                kc, n_vis, ll_ext.shape[1])
            out = g.apply(params_ema, global_latent=vis_gl,
                          local_latent=ll_ext, coords=coords, cp=cp,
                          noise_rng=jax.random.fold_in(kvis, 2 * mult))
            return out["gen"]

        return fwd

    vis_ext_forwards = []
    if g.ss is not None:
        vis_ext_forwards = [(m, _make_ext_forward(m)) for m in ext_mult_list]

    fid_eval = None
    fid_ext2_eval = None
    if not debug and cfg.test_params.calc_fid:
        from spgan_tpu.train.evals import TrainFID

        fid_eval = TrainFID(cfg, g, pipeline)
        if not fid_eval.available:
            print(" [!] Inception weights not found (SPGAN_TPU_INCEPTION); "
                  "FID evaluation disabled.")
            fid_eval = None
        elif cfg.test_params.calc_fid_ext2:
            from spgan_tpu.data.pipeline import make_train_pipeline

            fid_ext2_eval = TrainFID(
                cfg, g, make_train_pipeline(cfg, seed=seed + 7,
                                            include_full=True),
                inception_params=fid_eval.inception_params, ext2=True)

    # best-FID values persist across resume in a sidecar next to the ckpts
    # (the reference carries best_fid/best_ext2_fid inside the ckpt dict,
    # train.py:627-639,690-717)
    best_fid = float("inf")
    best_ext2_fid = float("inf")
    best_ext2_fid_later = float("inf")
    best_path = os.path.join(exp_root, "ckpt", "best.json") \
        if not debug else None
    if best_path is not None and os.path.exists(best_path):
        import json

        try:
            with open(best_path) as f:
                _b = json.load(f)
        except (json.JSONDecodeError, OSError):
            # a kill mid-write may leave a truncated file; resume with
            # defaults rather than crashing the restart
            _b = {}
        best_fid = _b.get("best_fid", best_fid)
        best_ext2_fid = _b.get("best_ext2_fid", best_ext2_fid)
        best_ext2_fid_later = _b.get("best_ext2_fid_later",
                                     best_ext2_fid_later)

    def _write_best():
        import json

        tmp = best_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"best_fid": best_fid, "best_ext2_fid": best_ext2_fid,
                       "best_ext2_fid_later": best_ext2_fid_later}, f)
        os.replace(tmp, best_path)  # atomic — survives a kill mid-write

    # TB event files are partitioned into chunks for efficient rsync of
    # long runs (reference train.py:35,724-726: TB_PARTITION_STEPS=100000
    # close+reopen, which starts a fresh event file)
    TB_PARTITION_STEPS = 100_000
    total = tp.iter if max_iters is None else min(tp.iter, max_iters)
    lp = cfg.log_params
    t_last = time.time()
    # Most-recent lazy-regularization metrics, carried across dispatches so a
    # log tick that doesn't coincide with a reg step still reports the last
    # computed r1/path values (the reference's loss_dict persists them the
    # same way, train.py:300,399,438-452).  Device arrays only — never forced
    # outside a log tick, so the async dispatch pipeline is unaffected.
    reg_carry = {}
    # --profile-dir: capture a jax.profiler device trace (XPlane, viewable in
    # TensorBoard / xprof) of iterations [profile_start, profile_start +
    # profile_iters) relative to the loop start.  This is the TPU-native
    # equivalent of the reference's torch.cuda timing hooks (SURVEY §5
    # tracing): the trace shows per-HLO device time, fusion boundaries and
    # host<->device transfers for the real compiled step.  Boundaries are
    # checked between device dispatches, so with steps_per_call > 1 they
    # snap to multiples of K; the actual window is printed.  Barriers are
    # host value fetches, NOT block_until_ready (which returns early through
    # the remote axon runtime — utils.misc.sync_fetch).
    from spgan_tpu.utils.misc import sync_fetch

    prof_on = False
    prof_started_at = None
    try:
        it = start_iter
        while it < total:
            if (profile_dir is not None and not prof_on
                    and it - start_iter >= profile_start):
                sync_fetch(state)  # exclude queued prior work
                jax.profiler.start_trace(profile_dir)
                prof_on = True
                prof_started_at = it
            k = min(k_steps, total - it)
            if k > 1:
                batches = [next(pipeline) for _ in range(k)]
                real_patch = shard_batch(jnp.asarray(np.stack(
                    [b["patch"] for b in batches], 0)), mesh, dim=1)
                real_ac = shard_batch(jnp.asarray(np.stack(
                    [b["ac_coords"] for b in batches], 0)), mesh, dim=1)
                r1s = tuple(((it + j) % tp.d_reg_every == 0)
                            for j in range(k))
                ppls = tuple((it + j) % tp.g_reg_every == 0
                             and (it + j) >= tp.g_path_start
                             for j in range(k))
                state, metrics = step_fn_many(state, real_patch, real_ac,
                                              base_key, do_r1=r1s,
                                              do_ppl=ppls)
                had_r1, had_ppl = any(r1s), any(ppls)
                it += k
                adv = k
            else:
                batch = next(pipeline)
                real_patch = shard_batch(jnp.asarray(batch["patch"]), mesh)
                real_ac = shard_batch(jnp.asarray(batch["ac_coords"]), mesh)
                do_r1 = (it % tp.d_reg_every == 0)
                do_ppl = ((it % tp.g_reg_every == 0)
                          and (it >= tp.g_path_start))
                state, metrics = step_fn(state, real_patch, real_ac, base_key,
                                         do_r1=do_r1, do_ppl=do_ppl)
                had_r1, had_ppl = do_r1, do_ppl
                it += 1
                adv = 1

            def tick(n):
                return crossed_tick(it, adv, n)

            if (prof_on
                    and it - start_iter >= profile_start + profile_iters):
                # close the window right after the traced step — BEFORE the
                # log/vis/save ticks below and before a possible loop exit,
                # so the trace covers exactly the requested iterations
                sync_fetch(state)  # include the traced steps
                jax.profiler.stop_trace()
                prof_on = False
                print(f" [*] Profiler trace written: iterations "
                      f"[{prof_started_at}, {it})")
                profile_dir = None
            if had_r1:
                reg_carry["r1"] = metrics["r1"]
            if had_ppl:
                reg_carry["path"] = metrics["path"]
                reg_carry["path_lengths"] = metrics["path_lengths"]

            if debug:
                jax.block_until_ready(state)
                print(" [debug] one iteration OK —",
                      {k: round(float(v), 4) for k, v in metrics.items()})
                break

            if tick(lp.log_tick) and writer is not None:
                for k, v in {**metrics, **reg_carry}.items():
                    writer.add_scalar(f"losses/{k}", float(v), it)
                now = time.time()
                writer.add_scalar("utils/iters_per_sec",
                                  lp.log_tick / max(now - t_last, 1e-9), it)
                # parameter histograms (reference train.py:454-458); one
                # representative leaf per module to bound TB event size
                try:
                    host_g = jax.device_get(state.params_g)
                    picks = {"ts_conv0_w":
                             host_g["ts"]["convs"][0]["conv"]["weight"]}
                    if "ss" in host_g:
                        picks["ss_sphere0_w"] = host_g["ss"]["blocks"][0][
                            "sphere"]["conv"]["weight"]
                    for hk, hv in picks.items():
                        writer.add_histogram(f"params/{hk}",
                                             np.asarray(hv).ravel(), it)
                except Exception:
                    pass
                t_last = now
                # device memory observability (reference utils.py:563-579)
                try:
                    ms = jax.local_devices()[0].memory_stats() or {}
                    for mk in ("bytes_in_use", "peak_bytes_in_use"):
                        if mk in ms:
                            writer.add_scalar(f"memory/{mk}",
                                              ms[mk] / 2 ** 20, it)
                except Exception:
                    pass

            if tick(lp.img_tick) and writer is not None:
                imgs = np.asarray(vis_forward(state.params_g_ema,
                                              jax.random.fold_in(kvis, it)))
                writer.add_image("samples/ema", _to_grid(imgs), it,
                                 dataformats="HWC")
                for mult, fwd in vis_ext_forwards:
                    ext = np.asarray(fwd(
                        state.params_g_ema,
                        jax.random.fold_in(kvis, it + mult)))
                    writer.add_image(f"samples/ema_ext{mult}",
                                     _to_grid(ext, max(1, 8 // mult)), it,
                                     dataformats="HWC")
                sd, td = vis_diversity(state.params_g_ema,
                                       jax.random.fold_in(kvis, it + 2))
                writer.add_image("samples/style_diversity",
                                 _to_grid(np.asarray(sd)), it,
                                 dataformats="HWC")
                writer.add_image("samples/structure_diversity",
                                 _to_grid(np.asarray(td)), it,
                                 dataformats="HWC")

            if tick(lp.save_tick) and ckpt_mgr is not None:
                ckpt_mgr.save(it, jax.device_get(state))

            if fid_eval is not None and tick(lp.eval_tick):
                fid = fid_eval(state.params_g_ema,
                               jax.random.fold_in(base_key, it))
                if writer is not None:
                    writer.add_scalar("metric/fid", fid, it)
                if fid < best_fid and ckpt_mgr is not None:
                    best_fid = fid
                    from spgan_tpu.train.checkpoint import save_best

                    save_best(os.path.join(exp_root, "ckpt"), "best_fid",
                              jax.device_get(state))
                    _write_best()

            if fid_ext2_eval is not None and tick(lp.fid_ext2_tick):
                fid2 = fid_ext2_eval(state.params_g_ema,
                                     jax.random.fold_in(base_key, it + 1))
                if writer is not None:
                    writer.add_scalar("metric/fid_ext2", fid2, it)
                # best-EXT2-FID snapshot + the late-training (>600k iters)
                # per-iteration variant (reference train.py:690-717)
                if ckpt_mgr is not None:
                    from spgan_tpu.train.checkpoint import save_best

                    if fid2 < best_ext2_fid:
                        best_ext2_fid = fid2
                        save_best(os.path.join(exp_root, "ckpt"),
                                  "best_fid_ext2", jax.device_get(state))
                        _write_best()
                    if it > 600_000 and fid2 < best_ext2_fid_later:
                        best_ext2_fid_later = fid2
                        save_best(os.path.join(exp_root, "ckpt"),
                                  f"best_fid_ext2_{it}",
                                  jax.device_get(state))
                        _write_best()

            if (writer is not None and it > start_iter
                    and tick(TB_PARTITION_STEPS)):
                writer.close()
                from tensorboardX import SummaryWriter

                writer = SummaryWriter(os.path.join(exp_root, "tb"))
    except Exception:
        if not debug:
            os.makedirs(exp_root, exist_ok=True)
            with open(os.path.join(exp_root, "error-log.txt"), "a") as f:
                f.write(traceback.format_exc() + "\n")
        raise
    finally:
        if prof_on:  # loop left inside the window (exception / debug break)
            try:  # the barrier itself can raise on a poisoned device —
                # never let it mask the propagating exception or skip the
                # pipeline/writer cleanup below
                sync_fetch(state)
            except Exception:
                pass
            try:
                jax.profiler.stop_trace()
                print(f" [*] Profiler trace written (window truncated at "
                      f"iteration {it})")
            except Exception:
                pass
        elif profile_dir is not None:
            print(f" [!] Profiler window never opened: the loop ended at "
                  f"iteration {it} before profile_start={profile_start} "
                  f"(relative to start iter {start_iter}); no trace written")
        pipeline.close()
        if writer is not None:
            writer.close()
    return state
