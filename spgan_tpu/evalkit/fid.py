"""FID: feature statistics + Frechet distance.

Reference parity (libs/fid.py):
  * cached real-set statistics per dataset key (:217-244 — pkl in .fid-cache/)
  * generated features via a generation callable (:59-122)
  * Frechet distance with scipy sqrtm on host (:125-156 — the O(2048^3)
    matrix sqrt stays on CPU; feature extraction runs on device)
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.evalkit.inception import InceptionV3FID


@dataclass
class FIDStats:
    mu: np.ndarray
    sigma: np.ndarray
    n: int

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({"mu": self.mu, "sigma": self.sigma, "n": self.n}, f)

    @classmethod
    def load(cls, path: str) -> "FIDStats":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return cls(mu=d["mu"], sigma=d["sigma"], n=d["n"])


def compute_stats(feature_batches: Iterable[np.ndarray]) -> FIDStats:
    """Streaming mean/covariance over feature batches (B, 2048)."""
    n = 0
    s = None
    ss = None
    for f in feature_batches:
        f = np.asarray(f, np.float64)
        if s is None:
            s = f.sum(0)
            ss = f.T @ f
        else:
            s += f.sum(0)
            ss += f.T @ f
        n += f.shape[0]
    mu = s / n
    sigma = (ss - n * np.outer(mu, mu)) / (n - 1)
    return FIDStats(mu=mu, sigma=sigma, n=n)


def frechet_distance(a: FIDStats, b: FIDStats, eps: float = 1e-6) -> float:
    """Reference libs/fid.py:135-155 semantics: sqrtm with disp=False (no
    LinAlgWarning print; singularity is expected — n_fid_sample <= 2048
    features in 2048-d make sigma rank-deficient by construction), the
    eps-offset retry only when the result is non-finite, and a loud raise
    when the square root comes back with a non-negligible imaginary
    diagonal (atol 1e-3) instead of silently taking .real."""
    import warnings

    from scipy import linalg

    def sqrtm_quiet(m):
        # scipy's disp= kwarg (what the reference passes) is deprecated;
        # the equivalent is suppressing the expected singular-matrix
        # LinAlgWarning around the plain call
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", linalg.LinAlgWarning)
            return linalg.sqrtm(m)

    diff = a.mu - b.mu
    covmean = sqrtm_quiet(a.sigma @ b.sigma)
    if not np.isfinite(covmean).all():
        offset = np.eye(a.sigma.shape[0]) * eps
        covmean = sqrtm_quiet((a.sigma + offset) @ (b.sigma + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                "cov sqrt has imaginary component "
                f"{np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff @ diff + np.trace(a.sigma) + np.trace(b.sigma)
                 - 2 * np.trace(covmean))


class FIDEvaluator:
    """Device feature extraction + cached real stats."""

    def __init__(self, inception_params, cache_dir: str = ".fid-cache"):
        self.spec = InceptionV3FID()
        self.params = inception_params
        self.cache_dir = cache_dir
        self._feat = jax.jit(self.spec.apply)

    def features(self, images) -> np.ndarray:
        """images: (B,H,W,3) in [-1,1] NHWC."""
        return np.asarray(self._feat(self.params, jnp.asarray(images)))

    def stats_from_batches(self, batches: Iterable) -> FIDStats:
        return compute_stats(self.features(b) for b in batches)

    def real_stats(self, dataset_key: str,
                   batches_fn: Optional[Callable[[], Iterable]] = None
                   ) -> FIDStats:
        path = os.path.join(self.cache_dir, f"{dataset_key}.pkl")
        if os.path.exists(path):
            return FIDStats.load(path)
        assert batches_fn is not None, (
            f"no cached stats at {path} and no data provided")
        stats = self.stats_from_batches(batches_fn())
        stats.save(path)
        return stats


def eval_fid(generation_fn: Callable[[int], Iterable],
             real_batches_fn: Callable[[], Iterable],
             inception_params, n_sample: int, batch_size: int,
             dataset_key: str = "dataset",
             cache_dir: str = ".fid-cache") -> float:
    """End-to-end FID (reference libs/fid.py:214-276 surface):
    generation_fn(n_batches) yields image batches in [-1,1]."""
    ev = FIDEvaluator(inception_params, cache_dir)
    real = ev.real_stats(dataset_key, real_batches_fn)
    n_batches = max(1, n_sample // batch_size)
    fake = ev.stats_from_batches(generation_fn(n_batches))
    return frechet_distance(real, fake)
