"""GAN losses and regularizers.

Behavioral parity targets (reference models/losses.py):
  * d_logistic_loss :25-28, g_nonsaturating_loss :44-46
  * d_r1_loss :36-41 (gradient penalty via double grad)
  * calc_path_lengths :60-68 + g_path_regularize :71-78 (PPL with a *list*
    of running means — the reference tracks one mean per latent group)
  * coord_ac_loss :81-95 (L1, vert-only flag)
  * noise_regularize :98-116

All are plain XLA ops; R1/PPL use jax.grad/jax.vjp (the whole model stack is
twice-differentiable — see ops/grid_sample.py for why no custom_vjp is used).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def l1_loss(a, b, reduce_all=False):
    d = jnp.abs(a - b)
    if reduce_all:
        return d.mean()
    return d.reshape(d.shape[0], -1).mean(1)


def l2_loss(a, b, reduce_all=False):
    d = 0.5 * jnp.square(a - b)
    if reduce_all:
        return d.mean()
    return d.reshape(d.shape[0], -1).mean(1)


def d_logistic_loss(real_pred, fake_pred):
    return (jax.nn.softplus(-real_pred).mean()
            + jax.nn.softplus(fake_pred).mean())


def g_nonsaturating_loss(fake_pred):
    return jax.nn.softplus(-fake_pred).mean()


def d_r1_penalty(d_fn, params, real_img, **d_kwargs):
    """sum of squared grads of D(real) w.r.t. the real image, per sample mean.

    d_fn(params, img, **d_kwargs) -> scalar-per-sample logits (B,1); kwargs
    carry ac labels / train flag for the projection-D path (reference
    train.py:293-297 runs R1 through the full training-mode forward)."""

    def scalar_out(img):
        return d_fn(params, img, **d_kwargs)["d_patch"].sum()

    grad = jax.grad(scalar_out)(real_img)
    return jnp.square(grad).reshape(grad.shape[0], -1).sum(1).mean()


def grad_reduce(grad: jnp.ndarray) -> jnp.ndarray:
    axes = tuple(range(1, grad.ndim))
    return jnp.sqrt(jnp.square(grad).mean(axes))


def ppl_lengths(key: jax.Array, synth_fn, styles: jnp.ndarray,
                noise: jnp.ndarray = None) -> jnp.ndarray:
    """Path length per sample: synth_fn(styles) -> image (B,H,W,3).

    `noise` overrides the sampled perturbation image (already including the
    1/sqrt(H*W) scale) — used by the training-step oracle to replay the
    reference's exact draw (reference losses.py:60-68)."""
    img, vjp = jax.vjp(synth_fn, styles)
    if noise is None:
        h, w = img.shape[1], img.shape[2]
        noise = (jax.random.normal(key, img.shape, img.dtype)
                 / math.sqrt(h * w))
    (g,) = vjp(noise)
    return grad_reduce(g)


def g_path_regularize(lengths: jnp.ndarray, mean_path_length: jnp.ndarray,
                      decay: float = 0.01):
    """Returns (penalty, new_mean). The running mean updates with the reference
    semantics: mean + decay*(batch_mean - mean) (losses.py:71-78)."""
    path_mean = mean_path_length + decay * (lengths.mean() - mean_path_length)
    penalty = jnp.square(lengths - path_mean).mean()
    return penalty, jax.lax.stop_gradient(path_mean)


def coord_ac_loss(pred: jnp.ndarray, label: jnp.ndarray,
                  vert_only: bool = True, hori_only: bool = False):
    if vert_only:
        return l1_loss(pred[:, 0], label[:, 0], reduce_all=True)
    if hori_only:
        return l1_loss(pred[:, 1], label[:, 1], reduce_all=True)
    return l1_loss(pred, label, reduce_all=True)


def noise_regularize(noises: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Shift-correlation penalty pyramid (reference losses.py:98-116); used by
    inversion tooling."""
    loss = jnp.float32(0.0)
    for noise in noises:
        n = noise
        while True:
            b, c, h, w = (n.shape[0], n.shape[3], n.shape[1], n.shape[2])
            loss = (loss
                    + jnp.square((n * jnp.roll(n, 1, axis=2)).mean())
                    + jnp.square((n * jnp.roll(n, 1, axis=1)).mean()))
            if min(h, w) <= 8:
                break
            if h % 2:
                n = n[:, :-1]
            if w % 2:
                n = n[:, :, :-1]
            h2, w2 = n.shape[1] // 2, n.shape[2] // 2
            n = n.reshape(b, h2, 2, w2, 2, c).mean(axis=(2, 4))
    return loss
