"""InceptionV3 (pytorch-fid variant) in JAX/NHWC for on-device FID features.

The reference uses the pytorch-fid InceptionV3 wrapper (libs/inception.py,
libs/calc_inception.py:51-57: InceptionV3([3], normalize_input=False) — pool3
2048-d features, bilinear resize to 299, FID-patched average pools with
count_include_pad=False).

Weights cannot be downloaded in this environment; load them from a local
pytorch-fid checkpoint (pt_inception-2015-12-05-6726825d.pth) via
`load_torch_inception(path)`.  `InceptionV3FID().init(key)` gives random
weights — structurally complete for pipeline tests (FID values are only
meaningful with the real weights).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------

def _conv_bn(params, x, stride=1, padding=(0, 0)):
    """BasicConv2d: conv (no bias) + frozen batchnorm (eps 1e-3) + relu."""
    w = params["w"]  # (kh,kw,in,out)
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = params["bn_g"] * jax.lax.rsqrt(params["bn_v"] + 1e-3)
    bias = params["bn_b"] - params["bn_m"] * scale
    return jax.nn.relu(y * scale.astype(x.dtype) + bias.astype(x.dtype))


def _init_conv_bn(key, kh, kw, cin, cout):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * 0.02,
        "bn_g": jnp.ones((cout,)), "bn_b": jnp.zeros((cout,)),
        "bn_m": jnp.zeros((cout,)), "bn_v": jnp.ones((cout,)),
    }


def _avgpool3(x, count_include_pad=False):
    """3x3 stride-1 avg pool, pad 1 (FID patch: count_include_pad=False)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


def _maxpool3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


# ---------------------------------------------------------------------
# blocks (torchvision InceptionV3 wiring)
# ---------------------------------------------------------------------

def _block_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"], _conv_bn(p["branch5x5_1"], x), padding=2)
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=1)
    bp = _conv_bn(p["branch_pool"], _avgpool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = _maxpool3s2(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _conv_bn(p["branch_pool"], _avgpool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(p, x):
    b3 = _conv_bn(p["branch3x3_2"], _conv_bn(p["branch3x3_1"], x), stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = _maxpool3s2(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(p, x, pool: str):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=(0, 1)),
        _conv_bn(p["branch3x3_2b"], b3, padding=(1, 0)),
    ], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=(0, 1)),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=(1, 0)),
    ], axis=-1)
    if pool == "avg":
        bp = _avgpool3(x)
    else:  # FIDInceptionE_2 uses max pool
        bp = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                   (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


_BLOCK_DEFS = {
    # name: (list of (param_name, kh, kw, cin, cout))
    "Mixed_5b": ("A", 192, 32), "Mixed_5c": ("A", 256, 64),
    "Mixed_5d": ("A", 288, 64),
    "Mixed_6a": ("B", 288, None),
    "Mixed_6b": ("C", 768, 128), "Mixed_6c": ("C", 768, 160),
    "Mixed_6d": ("C", 768, 160), "Mixed_6e": ("C", 768, 192),
    "Mixed_7a": ("D", 768, None),
    "Mixed_7b": ("E1", 1280, None), "Mixed_7c": ("E2", 2048, None),
}


def _block_param_shapes(kind: str, cin: int, extra) -> List[Tuple[str, int, int, int, int]]:
    if kind == "A":
        pf = extra
        return [("branch1x1", 1, 1, cin, 64),
                ("branch5x5_1", 1, 1, cin, 48), ("branch5x5_2", 5, 5, 48, 64),
                ("branch3x3dbl_1", 1, 1, cin, 64),
                ("branch3x3dbl_2", 3, 3, 64, 96),
                ("branch3x3dbl_3", 3, 3, 96, 96),
                ("branch_pool", 1, 1, cin, pf)]
    if kind == "B":
        return [("branch3x3", 3, 3, cin, 384),
                ("branch3x3dbl_1", 1, 1, cin, 64),
                ("branch3x3dbl_2", 3, 3, 64, 96),
                ("branch3x3dbl_3", 3, 3, 96, 96)]
    if kind == "C":
        c7 = extra
        return [("branch1x1", 1, 1, cin, 192),
                ("branch7x7_1", 1, 1, cin, c7),
                ("branch7x7_2", 1, 7, c7, c7), ("branch7x7_3", 7, 1, c7, 192),
                ("branch7x7dbl_1", 1, 1, cin, c7),
                ("branch7x7dbl_2", 7, 1, c7, c7),
                ("branch7x7dbl_3", 1, 7, c7, c7),
                ("branch7x7dbl_4", 7, 1, c7, c7),
                ("branch7x7dbl_5", 1, 7, c7, 192),
                ("branch_pool", 1, 1, cin, 192)]
    if kind == "D":
        return [("branch3x3_1", 1, 1, cin, 192),
                ("branch3x3_2", 3, 3, 192, 320),
                ("branch7x7x3_1", 1, 1, cin, 192),
                ("branch7x7x3_2", 1, 7, 192, 192),
                ("branch7x7x3_3", 7, 1, 192, 192),
                ("branch7x7x3_4", 3, 3, 192, 192)]
    # E
    return [("branch1x1", 1, 1, cin, 320),
            ("branch3x3_1", 1, 1, cin, 384),
            ("branch3x3_2a", 1, 3, 384, 384), ("branch3x3_2b", 3, 1, 384, 384),
            ("branch3x3dbl_1", 1, 1, cin, 448),
            ("branch3x3dbl_2", 3, 3, 448, 384),
            ("branch3x3dbl_3a", 1, 3, 384, 384),
            ("branch3x3dbl_3b", 3, 1, 384, 384),
            ("branch_pool", 1, 1, cin, 192)]


@dataclass(frozen=True)
class InceptionV3FID:
    resize_input: bool = True
    with_logits: bool = False  # fc head (for inception score)

    def init(self, key: jax.Array) -> dict:
        params: Dict[str, dict] = {}
        stem = [("Conv2d_1a_3x3", 3, 3, 3, 32), ("Conv2d_2a_3x3", 3, 3, 32, 32),
                ("Conv2d_2b_3x3", 3, 3, 32, 64), ("Conv2d_3b_1x1", 1, 1, 64, 80),
                ("Conv2d_4a_3x3", 3, 3, 80, 192)]
        i = 0
        for name, kh, kw, cin, cout in stem:
            params[name] = _init_conv_bn(jax.random.fold_in(key, i),
                                         kh, kw, cin, cout)
            i += 1
        for bname, (kind, cin, extra) in _BLOCK_DEFS.items():
            kind = kind[0] if kind in ("E1", "E2") else kind
            blk = {}
            for pname, kh, kw, ci, co in _block_param_shapes(kind, cin, extra):
                blk[pname] = _init_conv_bn(jax.random.fold_in(key, i),
                                           kh, kw, ci, co)
                i += 1
            params[bname] = blk
        if self.with_logits:
            params["fc"] = {
                "w": jax.random.normal(jax.random.fold_in(key, i),
                                       (2048, 1008)) * 0.02,
                "b": jnp.zeros((1008,)),
            }
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B,H,W,3) in [-1,1] -> pool3 features (B,2048) (or logits)."""
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        h = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
        h = _conv_bn(params["Conv2d_2a_3x3"], h)
        h = _conv_bn(params["Conv2d_2b_3x3"], h, padding=1)
        h = _maxpool3s2(h)
        h = _conv_bn(params["Conv2d_3b_1x1"], h)
        h = _conv_bn(params["Conv2d_4a_3x3"], h)
        h = _maxpool3s2(h)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            h = _block_a(params[name], h)
        h = _block_b(params["Mixed_6a"], h)
        for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            h = _block_c(params[name], h)
        h = _block_d(params["Mixed_7a"], h)
        h = _block_e(params["Mixed_7b"], h, pool="avg")
        h = _block_e(params["Mixed_7c"], h, pool="max")
        feat = h.mean(axis=(1, 2))  # adaptive avg pool -> (B, 2048)
        if self.with_logits and "fc" in params:
            return feat @ params["fc"]["w"] + params["fc"]["b"]
        return feat


# ---------------------------------------------------------------------
# torch weight conversion
# ---------------------------------------------------------------------

def load_torch_inception(path: str, with_logits: bool = False) -> dict:
    """Convert a pytorch-fid InceptionV3 state dict
    (pt_inception-2015-12-05-*.pth) to this module's param pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def grab(prefix):
        return {
            "w": sd[prefix + ".conv.weight"].numpy().transpose(2, 3, 1, 0),
            "bn_g": sd[prefix + ".bn.weight"].numpy(),
            "bn_b": sd[prefix + ".bn.bias"].numpy(),
            "bn_m": sd[prefix + ".bn.running_mean"].numpy(),
            "bn_v": sd[prefix + ".bn.running_var"].numpy(),
        }

    params: Dict[str, dict] = {}
    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        params[name] = grab(name)
    for bname, (kind, cin, extra) in _BLOCK_DEFS.items():
        k = kind[0] if kind in ("E1", "E2") else kind
        params[bname] = {
            pname: grab(f"{bname}.{pname}")
            for pname, *_ in _block_param_shapes(k, cin, extra)}
    if with_logits and "fc.weight" in sd:
        params["fc"] = {"w": sd["fc.weight"].numpy().T,
                        "b": sd["fc.bias"].numpy()}
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda v: jnp.asarray(v), params)
