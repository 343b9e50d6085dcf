"""Training state: G/D params, optimizers, EMA, PPL running mean.

Optimizer parity (reference train.py:835-879): Adam with the lazy-regularizer
discount — for a module regularized every N steps, lr *= N/(N+1) and
betas = (0, 0.99 ** (N/(N+1)))... precisely beta1^ratio, beta2^ratio with
(beta1, beta2) = (0, 0.99).  EMA decay 0.5 ** (32/10000) (train.py:110).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

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


class TorchAdamState(NamedTuple):
    mu: Any
    nu: Any
    count: Any  # int32 scalar PER LEAF (torch keeps per-param state['step'])


def torch_adam(lr: float, b1: float, b2: float,
               eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with torch.optim.Adam's PER-PARAMETER lazy-state semantics.

    The reference's phase structure leaves some parameters out of a phase's
    graph — e.g. the D coord-AC head receives NO gradient in the R1 phase
    (train.py:288-313 backs through d_patch only) — and torch skips
    None-grad params entirely: no step-count increment, no moment decay, no
    update.  optax.adam's single shared count diverges from that in the
    bias correction and in the second-moment decay of skipped steps (found
    by tests/test_trainstep_parity.py's drift probe: ~12%-of-lr mean delta
    error on D step 2).  Here a leaf is 'skipped' when its gradient is
    identically zero — the JAX manifestation of 'outside the graph'.  (A
    computed-but-exactly-zero gradient would also skip, unlike torch; for
    real-valued conv/linear grads that event has measure zero.)

    Math per active leaf (torch.optim.Adam, defaults, no weight decay):
      m <- b1*m + (1-b1)*g ; v <- b2*v + (1-b2)*g^2 ; c <- c+1
      update = -lr * (m / (1-b1^c)) / (sqrt(v / (1-b2^c)) + eps)

    update_fn accepts an optional per-leaf `active` pytree (python/traced
    bools) overriding the zero-detection: the reference's R1 backward adds
    `0 * compute_node` (train.py:306) precisely so every d_patch-graph
    parameter gets a (zero) grad tensor and IS stepped — count increment
    and second-moment decay included — while the AC head stays None and is
    skipped.  An in-graph-but-zero gradient is indistinguishable from an
    out-of-graph one by value, so the R1 phase passes the graph membership
    explicitly (see Discriminator.r1_graph_mask).
    """

    def init_fn(params):
        z = lambda p: jnp.zeros_like(p)  # noqa: E731
        return TorchAdamState(
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
            count=jax.tree_util.tree_map(
                lambda p: jnp.zeros((), jnp.int32), params))

    def update_fn(grads, state, params=None, active=None):
        del params
        if active is None:
            active = jax.tree_util.tree_map(lambda g: jnp.any(g != 0),
                                            grads)
        else:
            active = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, bool), active)
        count = jax.tree_util.tree_map(
            lambda c, a: c + a.astype(jnp.int32), state.count, active)
        mu = jax.tree_util.tree_map(
            lambda m, g, a: jnp.where(a, b1 * m + (1 - b1) * g, m),
            state.mu, grads, active)
        nu = jax.tree_util.tree_map(
            lambda n, g, a: jnp.where(a, b2 * n + (1 - b2) * g * g, n),
            state.nu, grads, active)

        def u(m, n, c, a):
            cf = c.astype(jnp.float32)
            bc1 = jnp.where(c > 0, 1.0 - b1 ** cf, 1.0)
            bc2 = jnp.where(c > 0, 1.0 - b2 ** cf, 1.0)
            step = (m / bc1) / (jnp.sqrt(n / bc2) + eps)
            return jnp.where(a & (c > 0), -lr * step,
                             jnp.zeros_like(m)).astype(m.dtype)

        updates = jax.tree_util.tree_map(u, mu, nu, count, active)
        return updates, TorchAdamState(mu=mu, nu=nu, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizers(cfg: Config):
    tp = cfg.train_params
    g_ratio = reg_ratio(tp.g_reg_every)
    d_ratio = reg_ratio(tp.d_reg_every)
    if tp.optimizer == "sgd":
        # reference train.py:838-845,850-864 (SGD keeps the lr discount)
        opt_g = optax.sgd(tp.lr * g_ratio)
        opt_d = optax.sgd(tp.lr * d_ratio * tp.d_weight)
    else:
        opt_g = torch_adam(tp.lr * g_ratio, b1=0.0 ** g_ratio,
                           b2=0.99 ** g_ratio, eps=1e-8)
        opt_d = torch_adam(tp.lr * d_ratio * tp.d_weight,
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
