"""The jitted GAN training step (D, R1, G, PPL, EMA in one program).

Mirrors the reference hot loop (train.py:200-415):
  1. D adversarial step (+ coordinate-AC losses)              :222-267
  2. lazy R1 every d_reg_every steps (double grad through D)  :288-313
  3. G adversarial step (+ AC + mode-seeking diversity)       :319-356
  4. lazy PPL every g_reg_every steps (double grad through G) :384-401
  5. EMA accumulate                                           :415

TPU-native: the four phases compile into ONE XLA program per (do_r1, do_ppl)
static combination; randomness (latents, crops, jitter, mixing, noise) is
in-graph from one key; data-parallelism comes from batch sharding over the
mesh — XLA inserts the gradient all-reduces.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from spgan_tpu.config import Config
from spgan_tpu.models.discriminator import Discriminator
from spgan_tpu.models.generator import Generator, pair_inputs
from spgan_tpu.models import losses
from spgan_tpu.models.latents import LatentSampler
from spgan_tpu.train.state import (TrainState, lr_schedule_factor,
                                    make_optimizers)


def training_sampler_plan(cfg: Config, g: Generator):
    """Gate + TS-skip tap plan shared by the step builder and
    tools/bench_train_decomp.py (one source of truth — a bench with its own
    gate could silently decompose a different program than the step).

    Pallas tap sampler for the SS sphere convs (gradient-exact, replaces
    the XLA gathers that dominate the training step — see
    ops/pallas/sphere_sample.py), plus the TS sphere-skip convs on the
    row-offset tap path: margins are static worst-case bounds over the
    training-crop distribution (the traced-cp counterpart of the engine's
    exact lattice margins).  Resolved at trace time.
    """
    tp = cfg.train_params
    if tp.pallas_train_sampler not in ("auto", "on", "off"):
        raise ValueError(
            f"pallas_train_sampler must be auto|on|off, "
            f"got {tp.pallas_train_sampler!r}")
    use_sampler = g.ss is not None and (
        tp.pallas_train_sampler == "on"
        or (tp.pallas_train_sampler == "auto"
            and jax.default_backend() == "tpu"))
    skip_sizes, skip_margins = [], None
    if use_sampler:
        from spgan_tpu.geometry.sphere_grid import training_col_margin

        grid = g.ss.coord_grid
        skip_sizes = g.ts.skip_sizes()
        skip_margins = [
            training_col_margin(s, 3, grid.size_x, grid.size_y, 0.8)
            for s in skip_sizes]
    return use_sampler, skip_sizes, skip_margins


def _build_step(cfg: Config, g: Generator, d: Discriminator,
                freeze_g_mask=None):
    tp = cfg.train_params
    sampler = LatentSampler(
        global_dim=tp.global_latent_dim, local_dim=tp.local_latent_dim,
        ts_input_size=tp.ts_input_size, ss_unfold_size=tp.ss_unfold_size,
        mixing=tp.mixing)
    opt_g, opt_d = make_optimizers(cfg)
    batch = tp.batch_size
    n_latent = g.ts.n_latent
    cdt = jnp.bfloat16 if tp.compute_dtype == "bfloat16" else jnp.float32
    use_sampler, skip_sizes, skip_margins = training_sampler_plan(cfg, g)

    # freeze support (reference train.py:959-978): baseline-loaded G keys
    # masked out of the update; the D is frozen wholesale.  MultiStepLR
    # (train.py:980-982) scales updates by 0.5 per passed milestone —
    # applied to the update (not the grad), which is exactly a lr factor.
    freeze_d = tp.freeze

    def mask_g(upd):
        if freeze_g_mask is None:
            return upd
        return jax.tree_util.tree_map(
            lambda u, frozen: jnp.zeros_like(u) if frozen else u,
            upd, freeze_g_mask)

    def scale_updates(upd, lr_factor):
        if lr_factor is None:
            return upd
        return jax.tree_util.tree_map(lambda u: u * lr_factor, upd)

    def sample_g_inputs(key, bsz):
        kgl, kll, kc, kidx, kn = jax.random.split(key, 5)
        gl = sampler.sample_global(kgl, bsz)
        ll = sampler.sample_local(kll, bsz)
        coords, ac, cp = g.ss.coord_grid.sample_training(kc, bsz)
        if g.use_div_z and tp.diversity_dual:
            # dual latents: global latent and coords are paired; local latent,
            # ac labels and coords_partial are NOT (faithful to reference
            # spgan.py:1331-1336 + :330-336).  diversity_dual=False is the
            # reference's disable_dual_latents escape hatch (spgan.py:1332)
            # made an explicit config flag.
            gl = pair_inputs(gl)
            coords = pair_inputs(coords)
        inject = jax.random.randint(kidx, (), 1, n_latent)
        # mixed precision: activations/weights compute in cdt (params stay
        # f32 in the optimizer); losses upcast logits to f32
        return gl.astype(cdt), ll.astype(cdt), coords, ac, cp, inject, kn

    def ss_tables(cp, ll):
        if not use_sampler:
            return None, "fused", None
        from spgan_tpu.geometry.sphere_grid import sphere_offset_tables_batch

        skip_tbls = [sphere_offset_tables_batch(cp, s, s)
                     for s in skip_sizes]
        return g.ss.train_tables(cp, ll.shape[1]), "sample", skip_tbls

    def g_forward(params_g, key, bsz, compute_diversity=True):
        gl, ll, coords, ac, cp, inject, kn = sample_g_inputs(key, bsz)
        tbls, tmode, skip_tbls = ss_tables(cp, ll)
        out = g.apply(params_g, global_latent=gl, local_latent=ll,
                      coords=coords, cp=cp, noise_rng=kn,
                      inject_index=inject, compute_diversity=compute_diversity,
                      ss_tables_list=tbls, ss_tables_mode=tmode,
                      ts_skip_tables=skip_tbls, ts_skip_margins=skip_margins)
        out["ac_coords"] = ac
        return out

    ac_args = dict(vert_only=tp.coord_ac_vert_only,
                   hori_only=tp.coord_ac_hori_only)

    # ------------------------------------------------------------------
    def step(state: TrainState, real_patch: jnp.ndarray,
             real_ac: jnp.ndarray, key: jax.Array,
             do_r1: bool, do_ppl: bool
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # derive the per-iteration key IN-GRAPH from (base key, step counter):
        # host-side key splitting would cost one device round trip per op,
        # which dominates the loop on remote-attached accelerators
        key = jax.random.fold_in(key, state.step)
        metrics: Dict[str, jnp.ndarray] = {}
        k_dfake, k_gfake, k_ppl = jax.random.split(key, 3)
        lr_factor = lr_schedule_factor(cfg, state.step)

        # ---------------- D phase ------------------------------------
        fake = g_forward(state.params_g, k_dfake, batch,
                         compute_diversity=False)
        fake_img = jax.lax.stop_gradient(fake["gen"])
        fake_ac = fake["ac_coords"]
        real_patch = real_patch.astype(cdt)

        def d_loss_fn(params_d):
            fp = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.float32),
                d.apply(params_d, fake_img, ac_coords=fake_ac, train=True))
            rp = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.float32),
                d.apply(params_d, real_patch, ac_coords=real_ac, train=True))
            loss = losses.d_logistic_loss(rp["d_patch"], fp["d_patch"])
            aux = {"d_adv_loss": loss}
            if d.use_coord_ac:
                ac_r = losses.coord_ac_loss(rp["ac_coords_pred"], real_ac,
                                            **ac_args)
                ac_f = losses.coord_ac_loss(fp["ac_coords_pred"], fake_ac,
                                            **ac_args)
                loss = loss + (ac_r + ac_f) * tp.coord_ac_w
                aux["d_ac_coords_real"] = ac_r
                aux["d_ac_coords_fake"] = ac_f
            aux["d_total_loss"] = loss
            return loss, aux

        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d)
        metrics["grad_norm/d"] = optax.global_norm(d_grads)
        upd, opt_d_state = opt_d.update(d_grads, state.opt_d, state.params_d)
        if freeze_d:
            upd = jax.tree_util.tree_map(jnp.zeros_like, upd)
        params_d = optax.apply_updates(state.params_d,
                                       scale_updates(upd, lr_factor))
        metrics.update(d_aux)

        # ---------------- R1 phase -----------------------------------
        if do_r1 and tp.r1 != 0:
            def r1_fn(params_d):
                return losses.d_r1_penalty(d.apply, params_d, real_patch,
                                           ac_coords=real_ac, train=True)

            def r1_loss_fn(params_d):
                r1 = r1_fn(params_d)
                return tp.r1 / 2.0 * r1 * tp.d_reg_every, r1

            (_, r1_val), r1_grads = jax.value_and_grad(
                r1_loss_fn, has_aux=True)(params_d)
            if tp.optimizer != "sgd":
                # torch-Adam graph-membership semantics for the R1 phase
                # (reference train.py:306 `+ 0*compute_node`): see
                # Discriminator.r1_graph_mask
                upd, opt_d_state = opt_d.update(
                    r1_grads, opt_d_state, params_d,
                    active=d.r1_graph_mask(params_d))
            else:
                upd, opt_d_state = opt_d.update(r1_grads, opt_d_state,
                                                params_d)
            if freeze_d:
                upd = jax.tree_util.tree_map(jnp.zeros_like, upd)
            params_d = optax.apply_updates(params_d,
                                           scale_updates(upd, lr_factor))
            metrics["r1"] = r1_val
        else:
            metrics["r1"] = jnp.zeros(())

        # ---------------- G phase ------------------------------------
        def g_loss_fn(params_g):
            out = g_forward(params_g, k_gfake, batch)
            fp = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.float32),
                d.apply(params_d, out["gen"], ac_coords=out["ac_coords"],
                        train=True))
            loss = losses.g_nonsaturating_loss(fp["d_patch"])
            aux = {"g_adv_loss": loss}
            if d.use_coord_ac:
                ac_f = losses.coord_ac_loss(fp["ac_coords_pred"],
                                            out["ac_coords"], **ac_args)
                loss = loss + ac_f * tp.coord_ac_w
                aux["g_ac_coords_fake"] = ac_f
            if g.use_div_z:
                div = out["diversity_z_loss"]
                loss = loss + div * tp.diversity_z_w
                aux["diversity_z_loss"] = div
            aux["g_total_loss"] = loss
            return loss, aux

        (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g)
        # per-module grad norms (TPU-native equivalent of the reference's
        # parameter-grad histograms, train.py:361-371,454-458 — scalars keep
        # the device->host metric transfer tiny)
        metrics["grad_norm/g"] = optax.global_norm(g_grads)
        if "ss" in g_grads:
            metrics["grad_norm/g_ss"] = optax.global_norm(g_grads["ss"])
        metrics["grad_norm/g_ts"] = optax.global_norm(g_grads["ts"])
        upd, opt_g_state = opt_g.update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(
            state.params_g, scale_updates(mask_g(upd), lr_factor))
        metrics.update(g_aux)

        # ---------------- PPL phase ----------------------------------
        mean_path = state.mean_path_length
        if do_ppl and tp.path_regularize != 0:
            pbsz = max(1, batch // tp.path_batch_shrink)

            def ppl_loss_fn(params_g):
                gl, ll, coords, ac, cp, inject, kn = sample_g_inputs(
                    k_ppl, pbsz)
                tbls, tmode, skip_tbls = ss_tables(cp, ll)
                structure = g.ss.apply(params_g["ss"], gl[:, 0], ll, coords,
                                       cp, tables_list=tbls,
                                       tables_mode=tmode)
                styles = g.build_styles(params_g, gl, inject)

                def synth(st):
                    return g.ts.synthesize(params_g["ts"], structure, st, cp,
                                           rng=kn, skip_tables=skip_tbls,
                                           skip_margins=skip_margins)

                lengths = losses.ppl_lengths(
                    jax.random.fold_in(k_ppl, 1), synth, styles)
                penalty, new_mean = losses.g_path_regularize(
                    lengths, state.mean_path_length)
                weighted = (tp.path_regularize * tp.g_reg_every * penalty)
                return weighted, (penalty, new_mean, lengths.mean())

            (_, (path_pen, mean_path, plen)), ppl_grads = \
                jax.value_and_grad(ppl_loss_fn, has_aux=True)(params_g)
            upd, opt_g_state = opt_g.update(ppl_grads, opt_g_state, params_g)
            params_g = optax.apply_updates(
                params_g, scale_updates(mask_g(upd), lr_factor))
            metrics["path"] = path_pen
            metrics["path_lengths"] = plen
        else:
            metrics["path"] = jnp.zeros(())
            metrics["path_lengths"] = jnp.zeros(())
        metrics["mean_path_length"] = mean_path

        # ---------------- EMA ----------------------------------------
        from spgan_tpu.train.state import ema_update

        params_g_ema = ema_update(state.params_g_ema, params_g)

        new_state = TrainState(
            step=state.step + 1,
            params_g=params_g, params_d=params_d,
            params_g_ema=params_g_ema,
            opt_g=opt_g_state, opt_d=opt_d_state,
            mean_path_length=mean_path,
        )
        return new_state, metrics

    return step


def make_train_step(cfg: Config, g: Generator, d: Discriminator,
                    freeze_g_mask=None):
    return functools.partial(jax.jit, static_argnames=("do_r1", "do_ppl"))(
        _build_step(cfg, g, d, freeze_g_mask=freeze_g_mask))


def make_train_step_many(cfg: Config, g: Generator, d: Discriminator,
                         freeze_g_mask=None):
    """K training steps per device call (one staged host->device transfer,
    one executable launch).  This amortizes per-dispatch latency — essential
    on remote-attached accelerators and a standard input-pipeline pattern on
    TPU pods.  Flags are static tuples (one bool per inner step), so only a
    handful of variants compile across the d_reg/g_reg cycle.

    freeze_g_mask is threaded through identically to make_train_step so
    baseline-transfer freezing behaves the same at any steps_per_call
    (reference train.py:959-978 freeze semantics).
    """
    base = _build_step(cfg, g, d, freeze_g_mask=freeze_g_mask)

    def step_many(state: TrainState, real_patches: jnp.ndarray,
                  real_acs: jnp.ndarray, key: jax.Array,
                  do_r1: Tuple[bool, ...], do_ppl: Tuple[bool, ...]):
        metrics = None
        # Lazily-regularized metrics are only meaningful on the inner steps
        # where the phase actually ran; returning the LAST inner step's dict
        # verbatim would report 0 whenever the window doesn't END on a reg
        # step (with log_tick=100 / d_reg_every=16 that is ALWAYS — the
        # round-3 5k run logged r1=path=0 for its whole life).  Keep the most
        # recent reg-step value from the window instead, mirroring the
        # reference's persisted loss_dict (train.py:300,399 assign only in
        # the reg branch, :438-452 log whatever value persists).
        reg_carry: Dict[str, jnp.ndarray] = {}
        for i, (r1, ppl) in enumerate(zip(do_r1, do_ppl)):
            state, metrics = base(state, real_patches[i], real_acs[i], key,
                                  do_r1=r1, do_ppl=ppl)
            if r1:
                reg_carry["r1"] = metrics["r1"]
            if ppl:
                reg_carry["path"] = metrics["path"]
                reg_carry["path_lengths"] = metrics["path_lengths"]
        metrics = dict(metrics)
        metrics.update(reg_carry)
        return state, metrics

    return functools.partial(jax.jit,
                             static_argnames=("do_r1", "do_ppl"))(step_many)
