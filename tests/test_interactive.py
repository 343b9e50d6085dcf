"""Interactive editing flow: create vars -> generate -> edit region ->
regenerate only overlapping patches."""
import numpy as np
import jax

from spgan_tpu.config import Config
from spgan_tpu.infer.managers import CloseLoopPanoramaManager
from spgan_tpu.models.generator import Generator


def test_interactive_region_update():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    cfg.task.height, cfg.task.width = 128, 672
    cfg.task.batch_size = 1
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))

    mgr = CloseLoopPanoramaManager(g=g, params_ema=params, config=cfg)
    mgr.task_specific_init()

    tv = mgr.create_vars(jax.random.PRNGKey(1))
    img1 = mgr.generate_with_vars(tv).copy()

    # edit a small latent region and regenerate with a matching update map
    zh, zw = tv.local_latent.shape[1:3]
    sel = np.zeros((zh, zw))
    sel[:6, :6] = 1
    rng = np.random.RandomState(0)
    new_z = tv.local_latent.copy()
    new_z[:, :6, :6] = rng.randn(1, 6, 6, new_z.shape[-1])
    tv.update_local_latent(new_z, sel)

    img2 = mgr.regenerate(tv, update_by_ss_map=sel)
    assert not np.array_equal(img1, img2)
    # far-away rows (not covered by any selected window) must be untouched
    plan = mgr.engine.plan
    safe_row_start = (6 + plan.window) // plan.geom.latentspace_step + 1
    px_safe = (safe_row_start + 1) * plan.geom.pixelspace_step
    if px_safe < plan.meta_h - 101:
        np.testing.assert_array_equal(img1[:, px_safe + 101:],
                                      img2[:, px_safe + 101:])


def test_save_image_batch(tmp_path):
    from spgan_tpu.infer.managers import save_image_batch

    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, (3, 16, 24, 3)).astype(np.float32)
    paths = save_image_batch(imgs, str(tmp_path), start_id=7)
    assert [p.endswith("000007.png") for p in paths][0]
    from PIL import Image

    back = np.asarray(Image.open(paths[1]))
    assert back.shape == (16, 24, 3)


def test_interactive_repl_scripted(tmp_path):
    """The --interactive REPL (infer/interactive.py) driven by a scripted
    command stream: gen -> region reroll -> save/load round-trip -> show.
    The reference parses --interactive (test.py:136) but ships no consumer;
    this is the working equivalent over the tested primitives."""
    import io

    from spgan_tpu.infer.interactive import run_interactive

    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    cfg.task.height, cfg.task.width = 128, 672
    cfg.task.batch_size = 1
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))

    mgr = CloseLoopPanoramaManager(g=g, params_ema=params, config=cfg)
    mgr.task_specific_init()

    vars_path = str(tmp_path / "vars.npz")
    script = io.StringIO("\n".join([
        "gen 3",
        "reroll region 0 0 4 4 7",
        f"save {vars_path}",
        "reroll global 9",
        f"load {vars_path}",
        "show",
        "bogus command",          # unknown -> message, no crash
        "reroll region oops",     # bad args -> message, no crash
        "quit",
    ]) + "\n")
    out_lines = []
    n = run_interactive(mgr, str(tmp_path / "imgs"), stream=script,
                        out=out_lines.append)
    assert n == 4  # gen, region reroll, global reroll, show

    import os

    pngs = sorted(os.listdir(tmp_path / "imgs"))
    assert pngs == ["000000.png", "000001.png", "000002.png", "000003.png"]
    # the save/load round-trip restored the pre-"reroll global" state, so
    # the `show` render equals the post-region-reroll image
    from PIL import Image

    img1 = np.asarray(Image.open(tmp_path / "imgs" / "000001.png"))
    img3 = np.asarray(Image.open(tmp_path / "imgs" / "000003.png"))
    np.testing.assert_array_equal(img1, img3)
    # the two error lines were reported, not raised
    errs = [l for l in out_lines if l.startswith(" [!]")]
    assert len(errs) == 2
