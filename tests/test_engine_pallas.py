"""Engine with the Pallas path (interpret mode on CPU) must match the XLA
gather path on the full lattice."""
import numpy as np
import jax

from spgan_tpu.config import Config
from spgan_tpu.infer.engine import PanoramaEngine
from spgan_tpu.infer.stitcher import build_close_loop_plan
from spgan_tpu.models.generator import Generator


def test_engine_pallas_matches_xla():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))
    plan = build_close_loop_plan(g, 128, 672)

    def run(use_pallas):
        eng = PanoramaEngine(g=g, plan=plan, batch=2, patch_chunk=4,
                             grid_partial=tp.partial, use_pallas=use_pallas)
        gl, z, noises = eng.sample_fields(jax.random.PRNGKey(3))
        return np.asarray(eng.generate_from_fields(params, gl, z, noises))

    a = run(False)
    b = run(True)  # interpret-mode pallas on CPU
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_engine_skip_tables_matches_gather_path():
    """use_skip_tables routes the TS sphere skip convs through the
    row-offset tap conv (ops/grid_sample.st_tap_conv) with exact per-size
    margins derived from the static lattice plan — the whole-lattice meta
    image must match the gather path."""
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))
    plan = build_close_loop_plan(g, 128, 672)

    def run(skip_tables):
        eng = PanoramaEngine(g=g, plan=plan, batch=2, patch_chunk=4,
                             grid_partial=tp.partial, use_pallas=False,
                             use_skip_tables=skip_tables)
        gl, z, noises = eng.sample_fields(jax.random.PRNGKey(3))
        return np.asarray(eng.generate_from_fields(params, gl, z, noises))

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_sharded_generate_matches_single_device():
    """Lattice sharded over the 8-device CPU mesh must reproduce the
    single-device meta image."""
    from spgan_tpu.parallel.mesh import make_mesh

    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))
    plan = build_close_loop_plan(g, 128, 672)
    eng = PanoramaEngine(g=g, plan=plan, batch=2, patch_chunk=4,
                         grid_partial=tp.partial, use_pallas=False)
    gl, z, noises = eng.sample_fields(jax.random.PRNGKey(3))
    want = np.asarray(eng.generate_from_fields(params, gl, z, noises))

    mesh = make_mesh()
    sharded = eng.make_sharded_generate(mesh)
    got = sharded(params, gl, z, noises)
    np.testing.assert_allclose(got, want, atol=1e-5)
