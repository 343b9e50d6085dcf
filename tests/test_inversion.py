"""Inversion pipeline: reconstructing a model-generated patch must drive the
reconstruction loss well below its initial value."""
import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.infer.inversion import invert_patch
from spgan_tpu.models.generator import Generator
from spgan_tpu.models.latents import LatentSampler


def test_invert_generated_patch():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 16
    tp.local_latent_dim = 8
    tp.channel_multiplier = 1
    tp.n_mlp = 1
    tp.ss_n_layers = 1
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 24)
    params = g.init(jax.random.PRNGKey(0))

    # target: a real sample from the model
    ls = LatentSampler(global_dim=16, local_dim=8, ts_input_size=11,
                       ss_unfold_size=tp.ss_unfold_size)
    key = jax.random.PRNGKey(1)
    kg, kl, kc, kn = jax.random.split(key, 4)
    gl = ls.sample_global(kg, 1, mixing=False)
    ll = ls.sample_local(kl, 1)
    coords, _, cp = g.ss.coord_grid.sample_training(kc, 1)
    target = g.apply(params, global_latent=gl, local_latent=ll,
                     coords=coords, cp=cp, noise_rng=kn)["gen"]

    res = invert_patch(g, params, target, cp, coords, steps=40, lr=0.1)
    assert np.isfinite(res.losses).all()
    # optimization must make substantial progress
    assert res.losses[-1] < 0.5 * res.losses[0], (res.losses[0],
                                                  res.losses[-1])
    rec = res.record()
    assert rec["local_latent"].shape[-1] == 8
    assert len(rec["noises"]) == g.ts.num_layers


def test_inversion_record_save_roundtrip(tmp_path):
    """InversionResult.save writes the npz layout the test.py --inv-records
    reader parses (z / noiseNN / wplus keys, batch-dim stripped on read)."""
    from spgan_tpu.infer.inversion import InversionResult

    res = InversionResult(
        local_latent=np.zeros((35, 35, 8), np.float32) + 0.5,
        noises=[np.zeros((s, s, 1), np.float32) + i
                for i, s in enumerate((19, 17, 31))],
        wplus=np.zeros((9, 16), np.float32),
        losses=np.linspace(1.0, 0.1, 5).astype(np.float32))
    path = str(tmp_path / "rec.npz")
    res.save(path)

    data = np.load(path)
    rec = {"local_latent": data["z"][0],
           "noises": [data[k][0] for k in sorted(data.files)
                      if k.startswith("noise")]}
    assert rec["local_latent"].shape == (35, 35, 8)
    assert len(rec["noises"]) == 3
    for i, n in enumerate(rec["noises"]):
        np.testing.assert_allclose(n, i)   # order preserved by zero-pad sort
    assert data["wplus"].shape == (1, 9, 16)
