"""StyleGAN2 patch discriminator with auxiliary coordinate head.

Behavioral parity targets (reference models/stylegan2discriminator.py):
  * ConvLayer  :9-55   (optional blur-downsample + equalized conv + fused act)
  * ResBlock   :58-77  ((conv1 + conv2-down + 1x1-skip-down) / sqrt(2))
  * StyleGan2Discriminator :80-229 — 1x1 stem, log2(101)~7 -> 4 ResBlocks,
    minibatch stddev (:205-213), final conv + 2 linears -> d_patch, and the
    coord auxiliary head -> ac_coords_pred when coord_use_ac (:145-162,221).
  * projection-D path (coord_use_pd, :128-130,164-175,198-227): taps the
    feature before the LAST ResBlock, projects the ac label through two
    linears, and adds coord_pd_w * <label_proj, sum_hw(feat)> to d_patch at
    training time.
  * categorical AC head (coord_ac_categorical, :146-154): coord_linear output
    widens to num_dir * vert_sample_size.  (NOTE: the reference's categorical
    LOSS branch is unreachable — losses.py:85 returns on vert_only before the
    categorical check at :90, and categorical asserts vert_only — so only the
    head-shape change is observable; replicated as such.)

Notes:
  * blur kernel [1,3,3,1], zero-padded convs — the D is planar (no sphere ops).
  * stddev_group: _smallest_divisor_larger_than(batch=16, start=4) returns 16
    (the loop range(4,4) is empty), so the stddev statistic spans the whole
    per-device batch — replicated faithfully.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from spgan_tpu.config import Config
from spgan_tpu.ops.linear import EqualConv2d, EqualLinear, fused_leaky_relu
from spgan_tpu.ops.upfirdn import Blur


def _smallest_divisor_at_least(number: int, start: int = 4) -> int:
    for i in range(start, int(math.sqrt(number))):
        if number % i == 0:
            return i
    return number


@dataclass(frozen=True)
class ConvLayer:
    in_ch: int
    out_ch: int
    kernel_size: int
    downsample: bool = False
    activate: bool = True
    bias: bool = True
    blur_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)

    def conv_spec(self) -> EqualConv2d:
        stride = 2 if self.downsample else 1
        pad = 0 if self.downsample else self.kernel_size // 2
        return EqualConv2d(self.in_ch, self.out_ch, self.kernel_size,
                           stride=stride, padding=pad,
                           bias=self.bias and not self.activate)

    def init(self, key: jax.Array) -> dict:
        params = {"conv": self.conv_spec().init(key)}
        if self.activate and self.bias:
            params["act_bias"] = jnp.zeros((self.out_ch,), jnp.float32)
        return params

    def __call__(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        if self.downsample:
            k = len(self.blur_kernel)
            p = (k - 2) + (self.kernel_size - 1)
            pad0, pad1 = (p + 1) // 2, p // 2
            x = Blur(self.blur_kernel, pad=(pad0, pad1))(x)
        y = self.conv_spec().apply(params["conv"], x)
        if self.activate:
            y = fused_leaky_relu(y, params.get("act_bias"))
        return y


@dataclass(frozen=True)
class ResBlock:
    in_ch: int
    out_ch: int

    def layers(self):
        return (ConvLayer(self.in_ch, self.in_ch, 3),
                ConvLayer(self.in_ch, self.out_ch, 3, downsample=True),
                ConvLayer(self.in_ch, self.out_ch, 1, downsample=True,
                          activate=False, bias=False))

    def init(self, key: jax.Array) -> dict:
        c1, c2, sk = self.layers()
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv1": c1.init(k1), "conv2": c2.init(k2), "skip": sk.init(k3)}

    def __call__(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        c1, c2, sk = self.layers()
        out = c2(params["conv2"], c1(params["conv1"], x))
        skip = sk(params["skip"], x)
        return (out + skip) / math.sqrt(2.0)


def minibatch_stddev(x: jnp.ndarray, group: int) -> jnp.ndarray:
    """x: (B,H,W,C). Appends one channel of per-group feature stddev
    (reference stylegan2discriminator.py:205-213)."""
    b, h, w, c = x.shape
    g = min(b, group)
    y = x.reshape(g, b // g, h, w, c)
    var = jnp.var(y, axis=0)  # biased
    std = jnp.sqrt(var + 1e-8)
    mean_std = std.mean(axis=(1, 2, 3), keepdims=True)  # (b//g,1,1,1)
    tiled = jnp.tile(mean_std, (g, h, w, 1))
    return jnp.concatenate([x, tiled], axis=-1)


@dataclass(frozen=True)
class Discriminator:
    patch_size: int = 101
    channel_multiplier: int = 2
    batch_size: int = 16
    use_coord_ac: bool = True
    coord_num_dir: int = 3
    linear_ch: int = 512
    # d_extra_multiplier: per-resolution channels are round()-scaled AFTER
    # the channel_multiplier (reference stylegan2discriminator.py:117-121);
    # linear_ch is scaled by from_config the same way (:114-116)
    extra_multiplier: float = 1.0
    use_coord_pd: bool = False
    coord_pd_w: float = 0.0
    coord_pd_hori_only: bool = False
    coord_ac_categorical: bool = False
    coord_vert_sample_size: int = 10

    @classmethod
    def from_config(cls, cfg: Config) -> "Discriminator":
        tp = cfg.train_params
        return cls(patch_size=tp.patch_size,
                   channel_multiplier=tp.channel_multiplier,
                   linear_ch=round(512 * tp.d_extra_multiplier),
                   extra_multiplier=tp.d_extra_multiplier,
                   batch_size=tp.batch_size,
                   use_coord_ac=tp.coord_use_ac,
                   coord_num_dir=tp.coord_num_dir,
                   use_coord_pd=tp.coord_use_pd,
                   coord_pd_w=tp.coord_pd_w,
                   coord_pd_hori_only=tp.coord_pd_hori_only,
                   coord_ac_categorical=tp.coord_ac_categorical,
                   coord_vert_sample_size=tp.coord_vert_sample_size)

    @property
    def coord_proj_dim(self) -> int:
        return (self.coord_num_dir - 1 if self.coord_pd_hori_only
                else self.coord_num_dir)

    @property
    def ac_out_dim(self) -> int:
        if self.coord_ac_categorical:
            return self.coord_num_dir * self.coord_vert_sample_size
        return self.coord_num_dir

    def channels(self) -> dict:
        cm = self.channel_multiplier
        base = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
                128: 128 * cm, 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm,
                2048: 8 * cm}
        if self.extra_multiplier != 1.0:
            base = {k: round(v * self.extra_multiplier)
                    for k, v in base.items()}
        return base

    @property
    def log_size(self) -> int:
        return int(round(math.log(self.patch_size, 2)))

    @property
    def stddev_group(self) -> int:
        return _smallest_divisor_at_least(self.batch_size, 4)

    def plan(self):
        ch = self.channels()
        stem = ConvLayer(3, ch[2 ** self.log_size], 1)
        blocks = []
        in_ch = ch[2 ** self.log_size]
        size = self.patch_size
        for i in range(self.log_size, 2, -1):
            out_ch = ch[2 ** (i - 1)]
            blocks.append(ResBlock(in_ch, out_ch))
            in_ch = out_ch
            size //= 2
        final_conv = ConvLayer(in_ch + 1, self.linear_ch, 3)
        flat = self.linear_ch * size * size
        return stem, blocks, final_conv, flat

    def init(self, key: jax.Array) -> dict:
        stem, blocks, final_conv, flat = self.plan()
        keys = jax.random.split(key, len(blocks) + 5)
        lc = self.linear_ch
        params = {
            "stem": stem.init(keys[0]),
            "blocks": [b.init(k) for b, k in zip(blocks, keys[1:1 + len(blocks)])],
            "final_conv": final_conv.init(keys[-4]),
            "final_linear": [
                EqualLinear(flat, lc, activation="fused_lrelu").init(keys[-3]),
                EqualLinear(lc, 1).init(keys[-2]),
            ],
        }
        if self.use_coord_ac:
            ka, kb = jax.random.split(keys[-1])
            params["coord_linear"] = [
                EqualLinear(flat, lc, activation="fused_lrelu").init(ka),
                EqualLinear(lc, self.ac_out_dim).init(kb),
            ]
        if self.use_coord_pd:
            kp1, kp2 = jax.random.split(jax.random.fold_in(keys[-1], 7))
            params["coord_proj"] = [
                EqualLinear(self.coord_proj_dim, lc,
                            activation="fused_lrelu").init(kp1),
                EqualLinear(lc, lc).init(kp2),
            ]
        return params

    def r1_graph_mask(self, params: dict) -> dict:
        """Per-leaf torch-Adam activity mask for the R1 phase.

        The reference's R1 backward runs through `r1/2 * r1_loss * reg +
        0 * d_patch[0]` (train.py:306): every parameter in the d_patch
        graph gets a gradient TENSOR (zero for the additive biases) and is
        stepped by torch-Adam (count increment + moment decay), while the
        coord-AC head — absent from that graph — keeps grad None and is
        skipped entirely.  Used with train.state.torch_adam(active=...)."""
        return {
            k: jax.tree_util.tree_map(lambda _: k != "coord_linear", v)
            for k, v in params.items()
        }

    def apply(self, params: dict, img: jnp.ndarray,
              ac_coords: jnp.ndarray = None,
              train: bool = False) -> Dict[str, jnp.ndarray]:
        """img: (B, H, W, 3) in [-1, 1].  ac_coords: (B, num_dir) labels,
        required at training time when use_coord_pd."""
        stem, blocks, final_conv, flat = self.plan()
        h = stem(params["stem"], img)
        last_feat = None
        for b, p in zip(blocks, params["blocks"]):
            last_feat = h          # feature entering the last ResBlock
            h = b(p, h)
        h = minibatch_stddev(h, self.stddev_group)
        h = final_conv(params["final_conv"], h)
        # match torch NCHW flatten order for checkpoint compatibility
        h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        lc = self.linear_ch
        l1 = EqualLinear(flat, lc, activation="fused_lrelu")
        l2 = EqualLinear(lc, 1)
        out = l2.apply(params["final_linear"][1],
                       l1.apply(params["final_linear"][0], h))
        ret = {"d_patch": out}
        if self.use_coord_ac:
            c1 = EqualLinear(flat, lc, activation="fused_lrelu")
            c2 = EqualLinear(lc, self.ac_out_dim)
            ret["ac_coords_pred"] = c2.apply(
                params["coord_linear"][1],
                c1.apply(params["coord_linear"][0], h))
        if self.use_coord_pd and train:
            assert ac_coords is not None, "coord_pd needs ac_coords labels"
            label = ac_coords[:, -self.coord_proj_dim:]
            p1 = EqualLinear(self.coord_proj_dim, lc,
                             activation="fused_lrelu")
            p2 = EqualLinear(lc, lc)
            label_proj = p2.apply(params["coord_proj"][1],
                                  p1.apply(params["coord_proj"][0], label))
            feat_proj = last_feat.sum(axis=(1, 2))  # (B, C)
            proj_pred = (label_proj * feat_proj).sum(
                axis=1, keepdims=True)
            ret["d_patch"] = ret["d_patch"] + proj_pred * self.coord_pd_w
        return ret
