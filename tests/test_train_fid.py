"""TrainFID structural test (random inception weights — checks the plumbing:
EMA generation path, stats caching, Frechet computation)."""
import numpy as np
import jax

from spgan_tpu.config import Config
from spgan_tpu.evalkit.inception import InceptionV3FID
from spgan_tpu.models.generator import Generator
from spgan_tpu.train.evals import TrainFID


class _FakePipe:
    def __init__(self, cfg, include_full=False):
        self.rng = np.random.RandomState(0)
        self.b = cfg.train_params.batch_size
        self.p = cfg.train_params.patch_size
        self.full = cfg.train_params.full_size

    def __next__(self):
        return {
            "patch": self.rng.rand(self.b, self.p, self.p, 3).astype(
                np.float32) * 2 - 1,
            "full": self.rng.rand(self.b, self.full, self.full, 3).astype(
                np.float32) * 2 - 1,
        }


def test_train_fid_pipeline(tmp_path, monkeypatch):
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    tp.batch_size = 4
    cfg.test_params.n_fid_sample = 8
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    params = g.init(jax.random.PRNGKey(0))

    inception = InceptionV3FID().init(jax.random.PRNGKey(1))
    monkeypatch.chdir(tmp_path)  # keep the stats cache local
    fid_eval = TrainFID(cfg, g, _FakePipe(cfg), inception_params=inception)
    assert fid_eval.available
    val = fid_eval(params, jax.random.PRNGKey(2))
    assert np.isfinite(val) and val > 0

    # ext2 variant (2x-extended generation, full-image stats)
    fid2 = TrainFID(cfg, g, _FakePipe(cfg), inception_params=inception,
                    ext2=True)
    val2 = fid2(params, jax.random.PRNGKey(3))
    assert np.isfinite(val2) and val2 > 0
