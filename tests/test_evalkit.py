"""Eval-suite structural tests (random weights — numeric FID needs the real
inception checkpoint, loaded via evalkit.inception.load_torch_inception)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spgan_tpu.evalkit.fid import (FIDStats, compute_stats, frechet_distance)
from spgan_tpu.evalkit.inception import InceptionV3FID
from spgan_tpu.evalkit.lpips import LPIPS
from spgan_tpu.evalkit.is_score import inception_score


@pytest.fixture(scope="module")
def inception():
    spec = InceptionV3FID()
    return spec, spec.init(jax.random.PRNGKey(0))


def test_inception_feature_shape(inception):
    spec, params = inception
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 101, 101, 3),
                           minval=-1, maxval=1)
    f = spec.apply(params, x)
    assert f.shape == (2, 2048)
    assert np.isfinite(np.asarray(f)).all()


def test_inception_param_count(inception):
    """The FID InceptionV3 trunk has ~21.8M params (conv+bn, no fc/aux)."""
    _, params = inception
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    assert 20e6 < n < 24e6, n


def test_fid_stats_and_distance():
    rng = np.random.RandomState(0)
    a = compute_stats([rng.randn(64, 16) for _ in range(4)])
    b = compute_stats([rng.randn(64, 16) for _ in range(4)])
    same = frechet_distance(a, a)
    diff = frechet_distance(a, b)
    assert abs(same) < 1e-6
    assert diff > 0
    shifted = FIDStats(mu=a.mu + 1.0, sigma=a.sigma, n=a.n)
    assert frechet_distance(a, shifted) == pytest.approx(16.0, rel=1e-3)


def test_fid_rank_deficient_stats():
    """n < d stats — the shape production FID actually runs (n_fid_sample
    2048 features in 2048-d give sigma rank n-1 < d, so sigma_a @ sigma_b
    is ALWAYS singular).  The disp=False sqrtm path (reference
    libs/fid.py:139) must return a finite, symmetric-sane value with no
    LinAlgWarning, and identical stats must still give ~0."""
    import warnings

    rng = np.random.RandomState(7)
    d, n = 256, 100  # rank 99 << 256: much harsher than production
    a = compute_stats([rng.randn(n // 2, d), rng.randn(n - n // 2, d)])
    b = compute_stats([rng.randn(n, d) * 1.1 + 0.05])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # ANY warning -> failure
        fid_ab = frechet_distance(a, b)
        fid_aa = frechet_distance(a, a)
    assert np.isfinite(fid_ab) and fid_ab > 0, fid_ab
    # identical rank-deficient stats: sqrtm(sigma^2) == sigma exactly in
    # the PSD sense, so the distance collapses to ~0 despite singularity
    assert abs(fid_aa) < 1e-3, fid_aa
    # symmetry of the metric under argument swap
    assert frechet_distance(b, a) == pytest.approx(fid_ab, rel=1e-6)


def test_fid_cache(tmp_path, inception):
    spec, params = inception
    from spgan_tpu.evalkit.fid import FIDEvaluator

    ev = FIDEvaluator(params, cache_dir=str(tmp_path))
    rng = np.random.RandomState(1)
    batches = [rng.rand(4, 64, 64, 3).astype(np.float32) * 2 - 1
               for _ in range(2)]
    s1 = ev.real_stats("toy", lambda: iter(batches))
    s2 = ev.real_stats("toy")  # from cache
    np.testing.assert_allclose(s1.mu, s2.mu)


def test_inception_score_runs():
    spec = InceptionV3FID(with_logits=True)
    params = spec.init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    batches = [rng.rand(4, 75, 75, 3).astype(np.float32) * 2 - 1
               for _ in range(2)]
    mean, std = inception_score(batches, params, splits=2)
    assert np.isfinite(mean) and mean >= 1.0


def test_lpips_properties():
    spec = LPIPS()
    params = spec.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    d_same = np.asarray(spec.apply(params, x, x))
    d_diff = np.asarray(spec.apply(params, x, y))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()
