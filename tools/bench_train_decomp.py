"""Decompose the training BASE step (D + G + EMA, the 142 ms that dominates
the amortized iteration — see docs/PERFORMANCE.md "Training roofline") into
its constituent costs on the real chip:

    g_fwd        — generator forward, train mode (tap sampler as in the step)
    g_fwd_bwd    — + grad w.r.t. params_g (the G-phase autodiff cost)
    d_fwd        — discriminator forward on fake+real (two applies)
    d_fwd_bwd    — + grad w.r.t. params_d (the D-phase autodiff cost)
    sample_taps  — offset-table construction + isolated Pallas tap
                   sampling / skip tap-conv reads (an isolation probe; in
                   the real step the sampling runs inside g_fwd/g_fwd_bwd)
    opt_ema      — both optax updates + EMA accumulate on zero grads
    base_step    — the real compiled step(do_r1=F, do_ppl=F) for reference

Each piece is its own jit, so fusion differs from the one-program step — the
sum will not exactly match base_step — but the ranking locates where the
backward-pass bandwidth goes (the step program's XLA profile is not
retrievable through the remote axon runtime).  Reference hot loop being
decomposed: /root/reference/train.py:222-415.

Usage: python tools/bench_train_decomp.py [config] [--bf16]
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


from spgan_tpu.utils.misc import sync_fetch as _force


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
    from spgan_tpu.models.generator import Generator, pair_inputs
    from spgan_tpu.models import losses
    from spgan_tpu.models.latents import LatentSampler
    from spgan_tpu.train.state import create_train_state, ema_update, \
        make_optimizers
    from spgan_tpu.train.step import make_train_step

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cfg_path = args[0] if args else "configs/model/spgan_run5k.yaml"
    cfg = load_config(cfg_path)
    tp = cfg.train_params
    if "--bf16" in sys.argv:
        object.__setattr__(tp, "compute_dtype", "bfloat16")
    cdt = jnp.bfloat16 if tp.compute_dtype == "bfloat16" else jnp.float32

    g = Generator.from_config(cfg)
    d = Discriminator.from_config(cfg)
    state = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = tp.batch_size
    patch = jnp.asarray(rng.randn(b, tp.patch_size, tp.patch_size, 3)
                        .astype(np.float32))
    ac = jnp.asarray(rng.uniform(-1, 1, (b, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    sampler = LatentSampler(
        global_dim=tp.global_latent_dim, local_dim=tp.local_latent_dim,
        ts_input_size=tp.ts_input_size, ss_unfold_size=tp.ss_unfold_size,
        mixing=tp.mixing)
    n_latent = g.ts.n_latent
    # the PRODUCTION gate/plan — shared with make_train_step so the pieces
    # decompose the same program the step compiles
    from spgan_tpu.train.step import training_sampler_plan

    use_sampler, skip_sizes, skip_margins = training_sampler_plan(cfg, g)

    def sample_g_inputs(key, bsz):
        kgl, kll, kc, kidx, kn = jax.random.split(key, 5)
        gl = sampler.sample_global(kgl, bsz)
        ll = sampler.sample_local(kll, bsz)
        coords, acc, cp = g.ss.coord_grid.sample_training(kc, bsz)
        if g.use_div_z and tp.diversity_dual:
            gl = pair_inputs(gl)
            coords = pair_inputs(coords)
        inject = jax.random.randint(kidx, (), 1, n_latent)
        return gl.astype(cdt), ll.astype(cdt), coords, acc, cp, inject, kn

    def ss_tables(cp, ll):
        if not use_sampler:
            return None, "fused", None
        from spgan_tpu.geometry.sphere_grid import sphere_offset_tables_batch

        skip_tbls = [sphere_offset_tables_batch(cp, s, s)
                     for s in skip_sizes]
        return g.ss.train_tables(cp, ll.shape[1]), "sample", skip_tbls

    def g_forward(params_g, key, compute_diversity=True):
        gl, ll, coords, acc, cp, inject, kn = sample_g_inputs(key, b)
        tbls, tmode, skip_tbls = ss_tables(cp, ll)
        out = g.apply(params_g, global_latent=gl, local_latent=ll,
                      coords=coords, cp=cp, noise_rng=kn,
                      inject_index=inject,
                      compute_diversity=compute_diversity,
                      ss_tables_list=tbls, ss_tables_mode=tmode,
                      ts_skip_tables=skip_tbls, ts_skip_margins=skip_margins)
        return out, acc

    # ---- pieces ---------------------------------------------------------
    @jax.jit
    def g_fwd(params_g, key):
        out, _ = g_forward(params_g, key, compute_diversity=False)
        return jnp.sum(out["gen"].astype(jnp.float32))

    @jax.jit
    def g_fwd_bwd(params_g, key):
        def loss_fn(p):
            out, _ = g_forward(p, key)
            loss = jnp.sum(out["gen"].astype(jnp.float32))
            if g.use_div_z:
                loss = loss + out["diversity_z_loss"] * tp.diversity_z_w
            return loss
        val, grads = jax.value_and_grad(loss_fn)(params_g)
        return val, grads

    fake_img = jnp.asarray(
        rng.randn(b, tp.patch_size, tp.patch_size, 3).astype(np.float32)
    ).astype(cdt)
    real_cdt = patch.astype(cdt)

    @jax.jit
    def d_fwd(params_d):
        fp = d.apply(params_d, fake_img, ac_coords=ac, train=True)
        rp = d.apply(params_d, real_cdt, ac_coords=ac, train=True)
        return (jnp.sum(fp["d_patch"].astype(jnp.float32))
                + jnp.sum(rp["d_patch"].astype(jnp.float32)))

    @jax.jit
    def d_fwd_bwd(params_d):
        def loss_fn(p):
            fp = d.apply(p, fake_img, ac_coords=ac, train=True)
            rp = d.apply(p, real_cdt, ac_coords=ac, train=True)
            return losses.d_logistic_loss(
                rp["d_patch"].astype(jnp.float32),
                fp["d_patch"].astype(jnp.float32))
        return jax.value_and_grad(loss_fn)(params_d)

    @jax.jit
    def sample_taps_only(params_g, key):
        # offset-table construction AND the actual tap sampling / tap-conv
        # reads, consumed into the output so nothing dead-code-eliminates:
        # one Pallas tap sample per SS layer table (C=259, the feat+coords
        # concat the real layers sample) and one tap-conv read per TS skip
        gl, ll, coords, acc, cp, inject, kn = sample_g_inputs(key, b)
        tbls, tmode, skip_tbls = ss_tables(cp, ll)
        if tbls is None:
            return jnp.zeros(())
        from spgan_tpu.ops.grid_sample import tap_conv_tables
        from spgan_tpu.ops.pallas.sphere_sample import st_sample_taps

        total = jnp.zeros((), jnp.float32)
        for i, t in enumerate(tbls):
            h = t["y0"].shape[1]
            x = jax.random.normal(jax.random.fold_in(kn, i),
                                  (b * (2 if g.use_div_z and
                                        tp.diversity_dual else 1),
                                   h, h, 259), cdt)
            x = x[:t["y0"].shape[0]]
            taps = st_sample_taps(x, t)
            total = total + jnp.sum(taps.astype(jnp.float32))
        w3 = jnp.ones((9, 3, 3), cdt)
        for t, m in zip(skip_tbls, skip_margins):
            h = t["y0"].shape[1]
            z = jax.random.normal(jax.random.fold_in(kn, 100 + h),
                                  (t["y0"].shape[0], h, h, 3), cdt)
            total = total + jnp.sum(
                tap_conv_tables(z, t, w3, margin=m).astype(jnp.float32))
        return total

    opt_g, opt_d = make_optimizers(cfg)
    zg = jax.tree_util.tree_map(jnp.zeros_like, state.params_g)
    zd = jax.tree_util.tree_map(jnp.zeros_like, state.params_d)

    @jax.jit
    def opt_ema(state):
        import optax
        ug, og = opt_g.update(zg, state.opt_g, state.params_g)
        pg = optax.apply_updates(state.params_g, ug)
        ud, od = opt_d.update(zd, state.opt_d, state.params_d)
        pd = optax.apply_updates(state.params_d, ud)
        ema = ema_update(state.params_g_ema, pg)
        return jax.tree_util.tree_leaves(ema)[0].astype(jnp.float32).sum() \
            + jax.tree_util.tree_leaves(pd)[0].astype(jnp.float32).sum()

    step = make_train_step(cfg, g, d)

    res = {}
    res["g_fwd"] = timeit(g_fwd, state.params_g, key)
    res["g_fwd_bwd"] = timeit(g_fwd_bwd, state.params_g, key)
    res["d_fwd"] = timeit(d_fwd, state.params_d)
    res["d_fwd_bwd"] = timeit(d_fwd_bwd, state.params_d)
    res["sample_tables"] = timeit(sample_taps_only, state.params_g, key)
    res["opt_ema"] = timeit(opt_ema, state)
    res["base_step"] = timeit(
        lambda: step(state, patch, ac, key, do_r1=False, do_ppl=False)[1])

    res["g_bwd_extra"] = res["g_fwd_bwd"] - res["g_fwd"]
    res["d_bwd_extra"] = res["d_fwd_bwd"] - res["d_fwd"]
    # the base step runs G fwd twice (D phase stop-grad fake + G phase) and
    # D fwd 3x (fake/real in D phase, fake in G phase)
    res["sum_est"] = (res["g_fwd"] + res["g_fwd_bwd"]
                      + 1.5 * res["d_fwd"] + res["d_bwd_extra"]
                      + res["opt_ema"])

    out = {
        "config": os.path.basename(cfg_path),
        "compute_dtype": tp.compute_dtype,
        "batch_size": b,
        "platform": jax.devices()[0].platform,
        "ms": {k: round(v * 1e3, 2) for k, v in res.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
