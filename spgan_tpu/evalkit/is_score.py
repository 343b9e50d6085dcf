"""Inception Score (reference libs/inception_score.py:14-71: KL(p(y|x) ||
p(y)) over softmax logits, with optional splits)."""
from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from spgan_tpu.evalkit.inception import InceptionV3FID


def inception_score(image_batches: Iterable, inception_params,
                    splits: int = 1) -> Tuple[float, float]:
    spec = InceptionV3FID(with_logits=True)
    feat = jax.jit(spec.apply)
    probs = []
    for b in image_batches:
        logits = feat(inception_params, jnp.asarray(b))
        probs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
    preds = np.concatenate(probs, 0)
    n = preds.shape[0]
    scores = []
    for k in range(splits):
        part = preds[k * (n // splits):(k + 1) * (n // splits)]
        py = part.mean(0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))
