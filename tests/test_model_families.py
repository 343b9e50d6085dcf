"""Other model families: styleGAN2 baseline (ts_input 4, zero-pad, blur
[1,3,3,1]) and the multi-resolution 197 patch arch (reference
spgan.py:458-487,608-662)."""
import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.models.generator import Generator, ts_conv_plan
from spgan_tpu.models.latents import LatentSampler
from spgan_tpu.ops.spatial import ConvSpec, derive_stitch_geometry


def test_baseline_generator_forward():
    cfg = Config()
    tp = cfg.train_params
    tp.styleGAN2_baseline = True
    tp.use_ss = False
    tp.ts_input_size = 4
    tp.patch_size = 64
    tp.ts_no_zero_pad = False
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.diversity_z_w = 0

    g = Generator.from_config(cfg)
    assert g.ss is None
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))
    assert "ss" not in params

    b = 2
    gl = LatentSampler(global_dim=32, local_dim=16, ts_input_size=4,
                       ss_unfold_size=0).sample_global(
                           jax.random.PRNGKey(1), b, mixing=False)
    ll = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 4, 16))
    out = g.apply(params, global_latent=gl, local_latent=ll, cp=None,
                  noise_rng=jax.random.PRNGKey(3))
    # zero-pad arch: 4 -> 8 -> 16 -> 32 -> 64 (power-of-two chain)
    assert out["gen"].shape == (b, 64, 64, 3)
    assert np.isfinite(np.asarray(out["gen"])).all()


def test_197_plan_and_geometry():
    convs, to_rgbs, i2j = ts_conv_plan(197, 11, 2)
    assert len(convs) == 10
    assert i2j == {3: 0, 5: 1, 7: 2, 9: 3}
    specs = [ConvSpec(upsample=c["upsample"]) for c in convs]
    geom = derive_stitch_geometry(specs, 11)
    assert geom.outfeat_sizes[-1] == 197
    assert geom.pixelspace_step % geom.latentspace_step == 0


def test_larger_res_plans():
    for res, n in ((389, 12), (773, 14), (1541, 16)):
        convs, to_rgbs, i2j = ts_conv_plan(res, 11, 2)
        assert len(convs) == n
        specs = [ConvSpec(upsample=c["upsample"]) for c in convs]
        geom = derive_stitch_geometry(specs, 11)
        assert geom.outfeat_sizes[-1] == res
