"""LPIPS perceptual distance (reference vendors the lpips package,
libs/lpips/: alex/vgg feature stacks + learned linear heads).

JAX/NHWC implementation of the v0.1 "alex" variant (the default in the
reference's PerceptualLoss):  AlexNet conv features at 5 taps, unit-normalize
per channel, 1x1 linear heads, spatial mean, sum over taps.

Weights are converted from torchvision-style AlexNet weights + the lpips
linear-head checkpoint via `load_torch_lpips(alex_path, lin_path)` — not
bundled (no network egress; point the loader at local files).  Random init is
available for structural tests.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet conv stack: (out, k, stride, pad), relu after each; maxpool after
# layers 0 and 1 (and before 2), matching torchvision features indices.
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1),
         (256, 3, 1, 1)]
# channel-wise normalization constants (lpips ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _maxpool3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


@dataclass(frozen=True)
class LPIPS:
    net: str = "alex"

    def init(self, key: jax.Array) -> dict:
        assert self.net == "alex", "vgg variant: convert weights via loader"
        convs = []
        cin = 3
        for i, (cout, k, s, p) in enumerate(_ALEX):
            kk = jax.random.fold_in(key, i)
            convs.append({
                "w": jax.random.normal(kk, (k, k, cin, cout)) * 0.02,
                "b": jnp.zeros((cout,)),
            })
            cin = cout
        lins = [{"w": jnp.abs(jax.random.normal(
            jax.random.fold_in(key, 100 + i), (c, 1)) * 0.01)}
            for i, c in enumerate([64, 192, 384, 256, 256])]
        return {"convs": convs, "lins": lins}

    def _features(self, params, x) -> List[jnp.ndarray]:
        h = (x - _SHIFT.reshape(1, 1, 1, 3)) / _SCALE.reshape(1, 1, 1, 3)
        feats = []
        for i, ((cout, k, s, p), cp) in enumerate(zip(_ALEX,
                                                      params["convs"])):
            h = jax.lax.conv_general_dilated(
                h, cp["w"].astype(h.dtype), (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + cp["b"]
            h = jax.nn.relu(h)
            feats.append(h)
            if i in (0, 1):
                h = _maxpool3s2(h)
        return feats

    def apply(self, params: dict, x: jnp.ndarray, y: jnp.ndarray
              ) -> jnp.ndarray:
        """x, y: (B,H,W,3) in [-1,1]. Returns per-sample LPIPS distance."""
        fx = self._features(params, x)
        fy = self._features(params, y)
        total = 0.0
        for a, b, lin in zip(fx, fy, params["lins"]):
            an = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            bn = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = jnp.square(an - bn)  # (B,H,W,C)
            w = jnp.maximum(lin["w"], 0.0)  # lpips clamps lin weights >= 0
            total = total + (d @ w).mean(axis=(1, 2, 3))
        return total


def load_lpips_lin_weights(lin_path: str) -> List[dict]:
    """Load the learned lpips linear heads (lin{i}.model.1.weight, each
    (1,C,1,1)) — e.g. the weights the reference vendors at
    libs/lpips/weights/v0.1/alex.pth."""
    import torch

    lsd = torch.load(lin_path, map_location="cpu", weights_only=False)
    lins = []
    for i in range(5):
        w = lsd[f"lin{i}.model.1.weight"].numpy()  # (1,C,1,1)
        lins.append({"w": jnp.asarray(w[:, :, 0, 0].T)})
    return lins


def load_torch_lpips(alex_features_path: str, lin_path: str) -> dict:
    """Convert torch weights: alexnet .pth (features.* convs) + lpips v0.1
    linear heads (lin{i}.model.1.weight)."""
    import torch

    asd = torch.load(alex_features_path, map_location="cpu",
                     weights_only=False)
    if hasattr(asd, "state_dict"):
        asd = asd.state_dict()
    conv_ids = [0, 3, 6, 8, 10]  # torchvision alexnet features indices
    convs = []
    for i in conv_ids:
        w = asd[f"features.{i}.weight"].numpy().transpose(2, 3, 1, 0)
        b = asd[f"features.{i}.bias"].numpy()
        convs.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    return {"convs": convs, "lins": load_lpips_lin_weights(lin_path)}
