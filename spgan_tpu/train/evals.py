"""Training-time FID evaluation (reference train.py:641-668 + the ext2
variant :676-719 — FID on 2x-extended generations center-cropped to
full_size)."""
from __future__ import annotations

import os
from typing import Optional

import jax

from spgan_tpu.config import Config
from spgan_tpu.models.generator import Generator
from spgan_tpu.models.latents import LatentSampler


def _inception_params():
    """Load real inception weights if SPGAN_TPU_INCEPTION points at a
    pytorch-fid checkpoint; else None (FID skipped).

    SPGAN_TPU_INCEPTION=random is an explicit plumbing-only escape: random
    inception weights so the full FID tick (generation, feature extraction,
    stats cache, Frechet) runs in environments without the pytorch-fid
    checkpoint.  The resulting FID VALUES are meaningless and a loud warning
    says so."""
    path = os.environ.get("SPGAN_TPU_INCEPTION")
    if not path:
        return None
    if path == "random":
        import jax as _jax

        from spgan_tpu.evalkit.inception import InceptionV3FID

        print(" [!] SPGAN_TPU_INCEPTION=random: FID plumbing runs with "
              "RANDOM inception weights — values are meaningless.")
        return InceptionV3FID().init(_jax.random.PRNGKey(0))
    if not os.path.exists(path):
        return None
    from spgan_tpu.evalkit.inception import load_torch_inception

    return load_torch_inception(path)


class TrainFID:
    """FID of EMA-generator patches vs the training set (is_fid_eval
    semantics: training-style coord crops, no dual latents).

    ext2=True: the EXT2-FID variant (reference train.py:676-719) — generate
    with a 2x-enlarged local latent field and center-crop to full_size,
    compared against full training images."""

    def __init__(self, cfg: Config, g: Generator, pipeline,
                 inception_params=None, ext2: bool = False):
        self.cfg = cfg
        self.g = g
        self.pipeline = pipeline
        self.ext2 = ext2
        self.inception_params = (inception_params
                                 if inception_params is not None
                                 else _inception_params())
        tp = cfg.train_params
        self.sampler = LatentSampler(
            global_dim=tp.global_latent_dim, local_dim=tp.local_latent_dim,
            ts_input_size=tp.ts_input_size, ss_unfold_size=tp.ss_unfold_size,
            mixing=tp.mixing)

        enlarge = 2 if ext2 else 1

        @jax.jit
        def gen(params_ema, key):
            kg, kl, kc, kn = jax.random.split(key, 4)
            b = tp.batch_size
            gl = self.sampler.sample_global(kg, b)
            ll = self.sampler.sample_local(kl, b,
                                           spatial_size_enlarge=enlarge)
            if enlarge == 1:
                coords, _, cp = g.ss.coord_grid.sample_training(kc, b)
            else:
                coords, _, cp = g.ss.coord_grid.sample_training_extrap(
                    kc, b, ll.shape[1])
            out = g.apply(params_ema, global_latent=gl, local_latent=ll,
                          coords=coords, cp=cp, noise_rng=kn)
            img = out["gen"]
            if enlarge != 1 and img.shape[1] > tp.full_size:
                p = (img.shape[1] - tp.full_size) // 2
                img = img[:, p:p + tp.full_size, p:p + tp.full_size]
            return img

        self._gen = gen

    @property
    def available(self) -> bool:
        return self.inception_params is not None

    def __call__(self, params_ema, key: jax.Array,
                 n_sample: Optional[int] = None) -> float:
        assert self.available, "no inception weights (set SPGAN_TPU_INCEPTION)"
        from spgan_tpu.evalkit.fid import FIDEvaluator, frechet_distance

        tp = self.cfg.train_params
        n = n_sample or self.cfg.test_params.n_fid_sample
        n_batches = max(1, n // tp.batch_size)
        ev = FIDEvaluator(self.inception_params)

        modality = "full" if self.ext2 else "patch"

        def real_batches():
            for _ in range(n_batches):
                yield next(self.pipeline)[modality]

        size_key = tp.full_size if self.ext2 else tp.patch_size
        key_dataset = (f"{self.cfg.data_params.dataset}-{size_key}"
                       f"{'-ext2' if self.ext2 else ''}_spgan_tpu")
        real = ev.real_stats(key_dataset, real_batches)

        def fake_batches():
            nonlocal key
            for _ in range(n_batches):
                key, k = jax.random.split(key)
                yield self._gen(params_ema, k)

        fake = ev.stats_from_batches(fake_batches())
        return frechet_distance(real, fake)
