"""End-to-end training-step test on the virtual 8-device CPU mesh: one full
D + R1 + G + PPL + EMA step, batch sharded over the mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.models.discriminator import Discriminator
from spgan_tpu.models.generator import Generator
from spgan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from spgan_tpu.train.state import create_train_state
from spgan_tpu.train.step import make_train_step


def tiny_config() -> Config:
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.batch_size = 8
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    tp.path_batch_shrink = 2
    return cfg


def shrink_generator(cfg):
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    return g


def _override_channels(d: Discriminator):
    # shrink D channels for CPU
    small = {k: 32 for k in d.channels()}
    object.__setattr__(d, "channels", lambda: small)
    object.__setattr__(d, "linear_ch", 32)
    return d


def test_full_train_step_on_mesh():
    cfg = tiny_config()
    g = shrink_generator(cfg)
    d = Discriminator(patch_size=101, channel_multiplier=1,
                      batch_size=cfg.train_params.batch_size,
                      use_coord_ac=True, coord_num_dir=3, linear_ch=32)
    small = {k: 32 for k in (4,8,16,32,64,128,256,512,1024,2048)}
    object.__setattr__(d, "channels", lambda: small)

    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8

    state = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
    state = replicate(state, mesh)

    rng = np.random.RandomState(0)
    real_patch = shard_batch(
        jnp.asarray(rng.randn(8, 101, 101, 3).astype(np.float32)), mesh)
    real_ac = shard_batch(
        jnp.asarray(rng.uniform(-1, 1, (8, 3)).astype(np.float32)), mesh)

    step = make_train_step(cfg, g, d)
    new_state, metrics = step(state, real_patch, real_ac,
                              jax.random.PRNGKey(1), do_r1=True, do_ppl=True)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["r1"]) >= 0
    assert int(new_state.step) == 1

    # params must have moved, EMA must have moved less
    def delta(a, b):
        return max(float(jnp.abs(x - y).max())
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert delta(new_state.params_g, state.params_g) > 0
    assert delta(new_state.params_d, state.params_d) > 0
    d_ema = delta(new_state.params_g_ema, state.params_g_ema)
    d_g = delta(new_state.params_g, state.params_g)
    assert 0 < d_ema < d_g

    # second step with lazy phases off must also run (separate jit variant)
    new_state2, m2 = step(new_state, real_patch, real_ac,
                          jax.random.PRNGKey(2), do_r1=False, do_ppl=False)
    assert float(m2["r1"]) == 0.0
    assert int(new_state2.step) == 2


def test_step_many_equals_sequential_steps():
    """K steps per call must reproduce K sequential single-step calls exactly
    (the per-iteration key derives from state.step in-graph)."""
    from spgan_tpu.train.step import make_train_step_many

    cfg = tiny_config()
    tp = cfg.train_params
    tp.batch_size = 8
    tp.n_mlp = 1
    tp.ss_n_layers = 1
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 16)
    d = Discriminator(patch_size=101, channel_multiplier=1,
                      batch_size=tp.batch_size,
                      use_coord_ac=True, coord_num_dir=3, linear_ch=16)
    small = {k: 16 for k in (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)}
    object.__setattr__(d, "channels", lambda: small)

    mesh = make_mesh()
    state0 = replicate(create_train_state(cfg, g, d, jax.random.PRNGKey(0)),
                       mesh)
    rng = np.random.RandomState(1)
    patches = rng.randn(2, 8, 101, 101, 3).astype(np.float32)
    acs = rng.uniform(-1, 1, (2, 8, 3)).astype(np.float32)
    key = jax.random.PRNGKey(5)

    step = make_train_step(cfg, g, d)
    s = state0
    r1_seq = None
    for i in range(2):
        s, m_seq = step(s, shard_batch(jnp.asarray(patches[i]), mesh),
                        shard_batch(jnp.asarray(acs[i]), mesh), key,
                        do_r1=(i == 0), do_ppl=False)
        if i == 0:
            r1_seq = float(m_seq["r1"])

    step_many = make_train_step_many(cfg, g, d)
    s2, m_many = step_many(
        state0, shard_batch(jnp.asarray(patches), mesh, dim=1),
        shard_batch(jnp.asarray(acs), mesh, dim=1), key,
        do_r1=(True, False), do_ppl=(False, False))

    for a, b in zip(jax.tree_util.tree_leaves(s.params_g),
                    jax.tree_util.tree_leaves(s2.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(s2.step) == 2
    np.testing.assert_allclose(float(m_seq["g_total_loss"]),
                               float(m_many["g_total_loss"]), rtol=1e-5)
    # lazy-reg metric carry: the window ENDS on a non-r1 step, but r1 ran at
    # inner step 0 — step_many must report that value, not the trailing 0
    # (the round-3 5k run logged r1=path=0 forever before this fix)
    assert r1_seq > 0
    np.testing.assert_allclose(float(m_many["r1"]), r1_seq, rtol=1e-5)


def test_pallas_sampler_step_matches_xla_step():
    """pallas_train_sampler='on' (interpret mode on CPU) must reproduce the
    XLA-gather training step: same losses, same parameter update."""
    import copy

    cfg = tiny_config()
    tp = cfg.train_params
    tp.batch_size = 4
    tp.n_mlp = 1
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 16)
    d = Discriminator(patch_size=101, channel_multiplier=1,
                      batch_size=tp.batch_size,
                      use_coord_ac=True, coord_num_dir=3, linear_ch=16)
    small = {k: 16 for k in (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)}
    object.__setattr__(d, "channels", lambda: small)

    state0 = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    patch = jnp.asarray(rng.randn(4, 101, 101, 3).astype(np.float32))
    ac = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    results = {}
    for mode in ("off", "on"):
        c = copy.deepcopy(cfg)
        c.train_params.pallas_train_sampler = mode
        step = make_train_step(c, g, d)
        s, m = step(state0, patch, ac, key, do_r1=False, do_ppl=True)
        results[mode] = (s, m)

    s_off, m_off = results["off"]
    s_on, m_on = results["on"]
    np.testing.assert_allclose(float(m_on["g_total_loss"]),
                               float(m_off["g_total_loss"]), rtol=2e-4)
    # the PPL penalty is quadratic in the (tiny) path lengths, which
    # amplifies float-reassociation noise — value-level check only
    np.testing.assert_allclose(float(m_on["path"]),
                               float(m_off["path"]), rtol=5e-2, atol=1e-6)
    # Adam's first step normalizes g/|g|, so float-reassociation noise on
    # near-zero grads flips the update sign (|diff| ~ 2*lr) on isolated
    # elements; gradient exactness itself is covered by
    # tests/test_pallas_sample.py.  Require near-identity in bulk.
    tot = bad = 0
    for a, b in zip(jax.tree_util.tree_leaves(s_on.params_g),
                    jax.tree_util.tree_leaves(s_off.params_g)):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        tot += diff.size
        bad += int((diff > 5e-4).sum())
        assert float(diff.max()) < 0.01
    assert bad / tot < 0.005, f"{bad}/{tot} params diverged"


def test_freeze_mask_and_lr_schedule_and_sgd():
    """freeze (reference train.py:959-978), MultiStepLR gamma 0.5
    (:980-982), and the SGD optimizer option (:838-845)."""
    cfg = tiny_config()
    tp = cfg.train_params
    tp.batch_size = 4
    tp.n_mlp = 1
    tp.ss_n_layers = 1
    tp.optimizer = "sgd"
    tp.lr_sch = (1,)        # halve lr from step >= 1
    tp.freeze = True        # freezes the whole D
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 16)
    d = Discriminator(patch_size=101, channel_multiplier=1,
                      batch_size=tp.batch_size,
                      use_coord_ac=True, coord_num_dir=3, linear_ch=16)
    small = {k: 16 for k in (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)}
    object.__setattr__(d, "channels", lambda: small)

    state0 = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
    # freeze every ss leaf of G
    freeze_g = jax.tree_util.tree_map(lambda _: False, state0.params_g)
    freeze_g["ss"] = jax.tree_util.tree_map(lambda _: True, freeze_g["ss"])

    rng = np.random.RandomState(3)
    patch = jnp.asarray(rng.randn(4, 101, 101, 3).astype(np.float32))
    ac = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))

    step = make_train_step(cfg, g, d, freeze_g_mask=freeze_g)
    s1, _ = step(state0, patch, ac, jax.random.PRNGKey(7),
                 do_r1=True, do_ppl=False)

    def delta(a, b):
        return max(float(jnp.abs(x - y).max())
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert delta(s1.params_d, state0.params_d) == 0.0       # D frozen
    assert delta(s1.params_g["ss"], state0.params_g["ss"]) == 0.0
    d_ts_step0 = delta(s1.params_g["ts"], state0.params_g["ts"])
    assert d_ts_step0 > 0                                   # TS trains

    # lr schedule: step 0 (full lr) vs step >= 1 (halved).  With SGD the
    # update is lr * grad, so the same grads at half lr move half as far —
    # compare a second step's magnitude against a no-schedule run.
    # (deep-copy: _build_step closes over cfg, and each static (do_r1,
    # do_ppl) variant traces lazily — mutating tp.lr_sch in place would
    # rewrite the schedule of the not-yet-traced variants of `step`)
    import copy

    cfg_nosch = copy.deepcopy(cfg)
    cfg_nosch.train_params.lr_sch = None
    step_nosch = make_train_step(cfg_nosch, g, d, freeze_g_mask=freeze_g)
    s2_sch, _ = step(s1, patch, ac, jax.random.PRNGKey(7),
                     do_r1=False, do_ppl=False)
    s2_nos, _ = step_nosch(s1, patch, ac, jax.random.PRNGKey(7),
                           do_r1=False, do_ppl=False)
    for a, b, c in zip(jax.tree_util.tree_leaves(s2_sch.params_g["ts"]),
                       jax.tree_util.tree_leaves(s2_nos.params_g["ts"]),
                       jax.tree_util.tree_leaves(s1.params_g["ts"])):
        # atol: the deltas subtract O(1)-magnitude stored params, so a few
        # ulps of the PARAM value (~5e-7) dominate, not ulps of the delta
        np.testing.assert_allclose(np.asarray(a - c), np.asarray(b - c) / 2.0,
                                   atol=1e-6)


def test_step_many_respects_freeze_mask():
    """steps_per_call>1 with an active freeze mask must keep the frozen
    generator leaves bit-identical (ADVICE r1: make_train_step_many used to
    drop the mask, silently updating frozen baseline-transfer params)."""
    from spgan_tpu.train.step import make_train_step_many

    cfg = tiny_config()
    tp = cfg.train_params
    tp.batch_size = 8
    tp.n_mlp = 1
    tp.ss_n_layers = 1
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 16)
    d = Discriminator(patch_size=101, channel_multiplier=1,
                      batch_size=tp.batch_size,
                      use_coord_ac=True, coord_num_dir=3, linear_ch=16)
    small = {k: 16 for k in (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)}
    object.__setattr__(d, "channels", lambda: small)

    mesh = make_mesh()
    state0 = replicate(create_train_state(cfg, g, d, jax.random.PRNGKey(0)),
                       mesh)
    freeze_g = jax.tree_util.tree_map(lambda _: False, state0.params_g)
    freeze_g["ss"] = jax.tree_util.tree_map(lambda _: True, freeze_g["ss"])

    rng = np.random.RandomState(4)
    patches = shard_batch(
        jnp.asarray(rng.randn(2, 8, 101, 101, 3).astype(np.float32)),
        mesh, dim=1)
    acs = shard_batch(
        jnp.asarray(rng.uniform(-1, 1, (2, 8, 3)).astype(np.float32)),
        mesh, dim=1)

    step_many = make_train_step_many(cfg, g, d, freeze_g_mask=freeze_g)
    s, _ = step_many(state0, patches, acs, jax.random.PRNGKey(9),
                     do_r1=(True, False), do_ppl=(False, False))

    def delta(a, b):
        return max(float(jnp.abs(x - y).max())
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert delta(s.params_g["ss"], state0.params_g["ss"]) == 0.0
    assert delta(s.params_g["ts"], state0.params_g["ts"]) > 0
    assert int(s.step) == 2
