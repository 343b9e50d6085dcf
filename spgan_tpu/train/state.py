"""Training state: G/D params, optimizers, EMA, PPL running mean.

Optimizer parity (reference train.py:835-879): Adam with the lazy-regularizer
discount — for a module regularized every N steps, lr *= N/(N+1) and
betas = (0, 0.99 ** (N/(N+1)))... precisely beta1^ratio, beta2^ratio with
(beta1, beta2) = (0, 0.99).  EMA decay 0.5 ** (32/10000) (train.py:110).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from spgan_tpu.config import Config
from spgan_tpu.models.discriminator import Discriminator
from spgan_tpu.models.generator import Generator


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    params_g_ema: Any
    opt_g: Any
    opt_d: Any
    mean_path_length: jnp.ndarray


def reg_ratio(reg_every: int) -> float:
    return reg_every / (reg_every + 1.0)


def make_optimizers(cfg: Config):
    tp = cfg.train_params
    g_ratio = reg_ratio(tp.g_reg_every)
    d_ratio = reg_ratio(tp.d_reg_every)
    if tp.optimizer == "sgd":
        # reference train.py:838-845,850-864 (SGD keeps the lr discount)
        opt_g = optax.sgd(tp.lr * g_ratio)
        opt_d = optax.sgd(tp.lr * d_ratio * tp.d_weight)
    else:
        opt_g = optax.adam(tp.lr * g_ratio, b1=0.0 ** g_ratio,
                           b2=0.99 ** g_ratio, eps=1e-8)
        opt_d = optax.adam(tp.lr * d_ratio * tp.d_weight,
                           b1=0.0 ** d_ratio, b2=0.99 ** d_ratio, eps=1e-8)
    return opt_g, opt_d


def lr_schedule_factor(cfg: Config, step):
    """MultiStepLR(gamma=0.5) factor at `step` (traced ok) — the reference
    steps both schedulers once per iteration (train.py:980-982)."""
    import jax.numpy as jnp

    tp = cfg.train_params
    if not tp.lr_sch:
        return None
    f = jnp.ones((), jnp.float32)
    for m in tp.lr_sch:
        f = f * jnp.where(step >= m, 0.5, 1.0)
    return f


def create_train_state(cfg: Config, g: Generator, d: Discriminator,
                       key: jax.Array) -> TrainState:
    kg, kd = jax.random.split(key)
    params_g = g.init(kg)
    params_d = d.init(kd)
    opt_g, opt_d = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        params_g_ema=jax.tree_util.tree_map(jnp.copy, params_g),
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
        mean_path_length=jnp.zeros((), jnp.float32),
    )


EMA_ACCUM = 0.5 ** (32.0 / (10 * 1000))


def ema_update(ema_params: Any, params: Any,
               accum: float = EMA_ACCUM) -> Any:
    """par_ema = accum*par_ema + (1-accum)*par (reference utils.py:86-94)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * accum + p * (1.0 - accum), ema_params, params)
