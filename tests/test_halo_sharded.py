"""Width-sharded inference with ppermute halo exchange: the 8-device result
must equal the 1-device result bit-for-bit (same fields, same math — only the
field placement and the ring communication differ)."""
import numpy as np
import jax

from spgan_tpu.config import Config
from spgan_tpu.infer.halo import generate_width_sharded
from spgan_tpu.infer.stitcher import build_close_loop_plan
from spgan_tpu.models.generator import Generator
from spgan_tpu.parallel.mesh import make_mesh


def test_width_sharded_halo_exchange():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 16
    tp.local_latent_dim = 8
    tp.channel_multiplier = 1
    tp.n_mlp = 1
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 16)
    params = g.init(jax.random.PRNGKey(0))

    # wide pano: 40 lattice columns -> 5 columns (30 latent cols) per device,
    # which fits the 23-col halo (window 23 for ss_n_layers=2)
    plan = build_close_loop_plan(g, 128, 3840)
    assert plan.num_steps_w_min == 40

    key = jax.random.PRNGKey(3)
    mesh8 = make_mesh()
    out8 = generate_width_sharded(g, params, plan, mesh8, key, batch=1,
                                  grid_partial=tp.partial)
    mesh1 = make_mesh(jax.devices()[:1])
    out1 = generate_width_sharded(g, params, plan, mesh1, key, batch=1,
                                  grid_partial=tp.partial)
    assert out8.shape == (1, plan.meta_h, 3840, 3)
    assert np.isfinite(out8).all()
    np.testing.assert_array_equal(out8, out1)


def test_width_sharded_halo_pad_drop():
    """nw NOT divisible by ndev (46 cols over 8 devices -> 6/device with 2
    padded wrap columns): the pad+drop path — wrap-extended fields, the
    device-0 halo sent from the wrap offset, duplicate columns dropped —
    must still be bit-identical to the 1-device run (pad=0 there)."""
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 16
    tp.local_latent_dim = 8
    tp.channel_multiplier = 1
    tp.n_mlp = 1
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 16)
    params = g.init(jax.random.PRNGKey(0))

    plan = build_close_loop_plan(g, 128, 4416)
    assert plan.num_steps_w_min == 46  # 46 % 8 == 6 -> pad 2

    key = jax.random.PRNGKey(5)
    mesh8 = make_mesh()
    out8 = generate_width_sharded(g, params, plan, mesh8, key, batch=1,
                                  grid_partial=tp.partial)
    mesh1 = make_mesh(jax.devices()[:1])
    out1 = generate_width_sharded(g, params, plan, mesh1, key, batch=1,
                                  grid_partial=tp.partial)
    assert out8.shape == (1, plan.meta_h, 4416, 3)
    assert np.isfinite(out8).all()
    np.testing.assert_array_equal(out8, out1)


def test_halo_engine_via_manager(tmp_path):
    """task.engine='halo' through the manager protocol (the test.py --engine
    halo path): run_next must route to generate_width_sharded and save a
    finite panorama of the target size."""
    from spgan_tpu.infer.managers import CloseLoopPanoramaManager

    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 16
    tp.local_latent_dim = 8
    tp.channel_multiplier = 1
    tp.n_mlp = 1
    tp.ss_n_layers = 2
    cfg.task.engine = "halo"
    cfg.task.height = 128
    cfg.task.width = 3840  # 40 lattice cols -> 5/device, fits the halo
    cfg.task.batch_size = 1

    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 16)
    params = g.init(jax.random.PRNGKey(0))

    mgr = CloseLoopPanoramaManager(g=g, params_ema=params, config=cfg,
                                   save_root=str(tmp_path / "out"))
    mgr.task_specific_init(seed=17)
    mgr.run_next(jax.random.PRNGKey(3))
    import os

    pngs = [f for f in os.listdir(tmp_path / "out") if f.endswith(".png")]
    assert pngs == ["000000.png"]
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "out" / "000000.png"))
    assert img.shape == (128, 3840, 3)
