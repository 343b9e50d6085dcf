"""Latent inversion: optimize (local latent window, per-layer noises, W+
styles) to reconstruct a target patch.

The reference consumes inversion records (testing_vars_wrapper.py:252-502
pastes them into the panorama fields; records are produced by an external
tool).  This module is the producer: a jitted Adam loop over

    L = L2(G(z, n, w+), target) + lambda_n * noise_regularize(n)
        [+ lambda_p * LPIPS if weights are provided]

Outputs a record dict directly consumable by TestingVars.replace_by_records.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from spgan_tpu.geometry.coords import CoordsPartial
from spgan_tpu.models.generator import Generator
from spgan_tpu.models.losses import noise_regularize


@dataclass
class InversionResult:
    local_latent: np.ndarray          # (zh, zw, C)
    noises: list                      # per layer (h, w, 1)
    wplus: np.ndarray                 # (n_latent, D)
    losses: np.ndarray                # per-step reconstruction loss

    def record(self) -> Dict:
        return {"local_latent": self.local_latent, "noises": self.noises,
                "wplus": self.wplus}

    def save(self, path: str) -> None:
        """Write the record in the layout test.py --inv-records reads."""
        import numpy as np

        arrs = {"z": np.asarray(self.local_latent)[None],
                "wplus": np.asarray(self.wplus)[None],
                "losses": np.asarray(self.losses)}
        for i, n in enumerate(self.noises):
            arrs[f"noise{i:02d}"] = np.asarray(n)[None]
        np.savez(path, **arrs)


def invert_patch(g: Generator, params: dict, target: jnp.ndarray,
                 cp: CoordsPartial, coords: jnp.ndarray,
                 steps: int = 200, lr: float = 0.05,
                 noise_weight: float = 1e3,
                 lpips_params: Optional[dict] = None,
                 lpips_weight: float = 1.0,
                 key: Optional[jax.Array] = None) -> InversionResult:
    """target: (1, P, P, 3) in [-1,1]; coords: (1, zh, zw, coord_dim) raw.

    Optimizes in W+ (per-layer styles), the SS local-latent window and the TS
    noise maps, starting from the mean latent (the standard GAN-inversion
    setup)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    zh = zw = g.ss.coord_grid.ss_spatial_size
    geom = g.ts.stitch_geometry()

    k1, k2, k3 = jax.random.split(key, 3)
    w_mean = g.ts.mean_latent(params["ts"], k1, 1024)[0]
    variables = {
        "z": jax.random.normal(k2, (1, zh, zw, g.ts.local_dim)),
        # free global conditioning for the SS (it is modulated by raw z in
        # normal operation; inversion optimizes it directly)
        "gz": jax.random.normal(jax.random.fold_in(k2, 1),
                                (1, g.ts.global_dim)),
        "wplus": jnp.tile(w_mean[None, None], (1, g.ts.n_latent, 1)),
        "noises": [jax.random.normal(jax.random.fold_in(k3, i), (1, s, s, 1))
                   for i, s in enumerate(geom.outfeat_sizes)],
    }

    lpips_spec = None
    if lpips_params is not None:
        from spgan_tpu.evalkit.lpips import LPIPS

        lpips_spec = LPIPS()

    def loss_fn(v):
        structure = g.ss.apply(params["ss"], v["gz"], v["z"], coords, cp)
        img = g.ts.synthesize(params["ts"], structure, v["wplus"], cp,
                              noises=v["noises"])
        rec = jnp.mean(jnp.square(img - target))
        loss = rec
        if lpips_spec is not None:
            loss = loss + lpips_weight * lpips_spec.apply(
                lpips_params, img, target).mean()
        loss = loss + noise_weight * noise_regularize(v["noises"])
        return loss, rec

    opt = optax.adam(lr)
    opt_state = opt.init(variables)

    @jax.jit
    def step(v, s):
        (loss, rec), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        upd, s = opt.update(grads, s, v)
        v = optax.apply_updates(v, upd)
        # keep noise maps unit-variance-ish (reference inversion practice)
        v["noises"] = [n / (jnp.std(n) + 1e-8) for n in v["noises"]]
        return v, s, rec

    losses = []
    for _ in range(steps):
        variables, opt_state, rec = step(variables, opt_state)
        losses.append(float(rec))

    return InversionResult(
        local_latent=np.asarray(variables["z"][0]),
        noises=[np.asarray(n[0]) for n in variables["noises"]],
        wplus=np.asarray(variables["wplus"][0]),
        losses=np.asarray(losses))
