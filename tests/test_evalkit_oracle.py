"""Numeric oracles for the eval stack (VERDICT r1 Missing #3):

* LPIPS: the REAL vendored lin weights
  (/root/reference/libs/lpips/weights/v0.1/alex.pth) loaded through the
  converter, and the full alex-LPIPS forward checked against an independent
  torch NCHW implementation written here (conv/relu/maxpool/scaling/
  normalize/lin/spatial-mean — reference libs/lpips/networks_basic.py).
* InceptionV3 (pytorch-fid variant): a synthetic state dict with the exact
  pytorch-fid key layout round-tripped through load_torch_inception, and the
  JAX forward checked against an independent torch NCHW implementation of the
  FID-patched network (BasicConv2d, count_include_pad=False avg pools,
  torchvision wiring).

These are non-self-referential: the expected values come from torch ops in
NCHW, not from the JAX code under test.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

LPIPS_LIN_PATH = "/root/reference/libs/lpips/weights/v0.1/alex.pth"


# ---------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------

def _torch_lpips_alex(convs, lins, x, y):
    """Independent NCHW implementation of lpips-alex v0.1
    (reference networks_basic.py:63-100, pretrained_networks alexnet slices).
    convs: list of (w (out,in,k,k), b); lins: list of (1,C,1,1) weights.
    x, y: (B,3,H,W) in [-1,1]."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    strides = [4, 1, 1, 1, 1]
    pads = [2, 2, 1, 1, 1]

    def feats(img):
        h = (img - shift) / scale
        out = []
        for i, (w, b) in enumerate(convs):
            h = F.relu(F.conv2d(h, w, b, stride=strides[i], padding=pads[i]))
            out.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, kernel_size=3, stride=2)
        return out

    fx, fy = feats(x), feats(y)
    total = 0.0
    for a, b, lw in zip(fx, fy, lins):
        an = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        bn = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (an - bn) ** 2
        r = F.conv2d(d, lw)  # NetLinLayer: 1x1 conv, no bias
        total = total + r.mean(dim=(2, 3)).squeeze(1)
    return total


def test_lpips_vendored_lin_weights_against_torch_oracle():
    if not os.path.exists(LPIPS_LIN_PATH):
        pytest.skip("reference lpips weights not mounted")
    from spgan_tpu.evalkit.lpips import LPIPS, load_lpips_lin_weights

    lins = load_lpips_lin_weights(LPIPS_LIN_PATH)
    chans = [64, 192, 384, 256, 256]
    assert [l["w"].shape for l in lins] == [(c, 1) for c in chans]
    # the lpips package clamps lin weights >= 0 during training; the released
    # v0.1 weights must already be non-negative (our apply relies on it)
    for l in lins:
        assert float(jnp.min(l["w"])) >= 0.0

    # random alexnet-shaped conv weights shared by both implementations
    rng = np.random.RandomState(0)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    convs_np = [(rng.randn(*s).astype(np.float32) * 0.05,
                 rng.randn(s[0]).astype(np.float32) * 0.1) for s in shapes]

    lp = LPIPS()
    params = {
        "convs": [{"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                   "b": jnp.asarray(b)} for w, b in convs_np],
        "lins": lins,
    }
    x = rng.uniform(-1, 1, (2, 3, 95, 95)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 95, 95)).astype(np.float32)

    got = np.asarray(lp.apply(params,
                              jnp.asarray(x.transpose(0, 2, 3, 1)),
                              jnp.asarray(y.transpose(0, 2, 3, 1))))
    want = _torch_lpips_alex(
        [(torch.from_numpy(w), torch.from_numpy(b)) for w, b in convs_np],
        [torch.from_numpy(np.asarray(l["w"]).T[:, :, None, None].copy())
         for l in lins],
        torch.from_numpy(x), torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------
# InceptionV3 (pytorch-fid layout)
# ---------------------------------------------------------------------

def _make_synthetic_pt_inception_sd(rng):
    """State dict with the exact pytorch-fid / torchvision InceptionV3 key
    names and shapes (pt_inception-2015-12-05 layout)."""
    from spgan_tpu.evalkit.inception import (_BLOCK_DEFS,
                                             _block_param_shapes)

    sd = {}

    def add_conv_bn(prefix, kh, kw, cin, cout):
        sd[f"{prefix}.conv.weight"] = torch.from_numpy(
            (rng.randn(cout, cin, kh, kw) * (0.5 / np.sqrt(cin * kh * kw)))
            .astype(np.float32))
        sd[f"{prefix}.bn.weight"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, cout).astype(np.float32))
        sd[f"{prefix}.bn.bias"] = torch.from_numpy(
            (rng.randn(cout) * 0.1).astype(np.float32))
        sd[f"{prefix}.bn.running_mean"] = torch.from_numpy(
            (rng.randn(cout) * 0.1).astype(np.float32))
        sd[f"{prefix}.bn.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, cout).astype(np.float32))

    for name, kh, kw, cin, cout in [
            ("Conv2d_1a_3x3", 3, 3, 3, 32), ("Conv2d_2a_3x3", 3, 3, 32, 32),
            ("Conv2d_2b_3x3", 3, 3, 32, 64), ("Conv2d_3b_1x1", 1, 1, 64, 80),
            ("Conv2d_4a_3x3", 3, 3, 80, 192)]:
        add_conv_bn(name, kh, kw, cin, cout)
    for bname, (kind, cin, extra) in _BLOCK_DEFS.items():
        k = kind[0] if kind in ("E1", "E2") else kind
        for pname, kh, kw, ci, co in _block_param_shapes(k, cin, extra):
            add_conv_bn(f"{bname}.{pname}", kh, kw, ci, co)
    return sd


class _TorchConvBN:
    def __init__(self, sd, prefix):
        self.w = sd[f"{prefix}.conv.weight"]
        self.g = sd[f"{prefix}.bn.weight"]
        self.b = sd[f"{prefix}.bn.bias"]
        self.m = sd[f"{prefix}.bn.running_mean"]
        self.v = sd[f"{prefix}.bn.running_var"]

    def __call__(self, x, stride=1, padding=0):
        y = F.conv2d(x, self.w, stride=stride, padding=padding)
        return F.relu(F.batch_norm(y, self.m, self.v, self.g, self.b,
                                   training=False, eps=1e-3))


def _torch_fid_inception_pool3(sd, x):
    """Independent NCHW forward of the FID inception to pool3 features
    (reference libs/inception.py FIDInception{A,C,E_1,E_2} +
    torchvision wiring; avg pools count_include_pad=False)."""
    def cb(prefix):
        return _TorchConvBN(sd, prefix)

    def avg3(t):
        return F.avg_pool2d(t, 3, stride=1, padding=1,
                            count_include_pad=False)

    h = cb("Conv2d_1a_3x3")(x, stride=2)
    h = cb("Conv2d_2a_3x3")(h)
    h = cb("Conv2d_2b_3x3")(h, padding=1)
    h = F.max_pool2d(h, 3, stride=2)
    h = cb("Conv2d_3b_1x1")(h)
    h = cb("Conv2d_4a_3x3")(h)
    h = F.max_pool2d(h, 3, stride=2)

    for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):  # A
        b1 = cb(f"{blk}.branch1x1")(h)
        b5 = cb(f"{blk}.branch5x5_2")(cb(f"{blk}.branch5x5_1")(h), padding=2)
        bd = cb(f"{blk}.branch3x3dbl_1")(h)
        bd = cb(f"{blk}.branch3x3dbl_2")(bd, padding=1)
        bd = cb(f"{blk}.branch3x3dbl_3")(bd, padding=1)
        bp = cb(f"{blk}.branch_pool")(avg3(h))
        h = torch.cat([b1, b5, bd, bp], 1)

    blk = "Mixed_6a"  # B
    b3 = cb(f"{blk}.branch3x3")(h, stride=2)
    bd = cb(f"{blk}.branch3x3dbl_1")(h)
    bd = cb(f"{blk}.branch3x3dbl_2")(bd, padding=1)
    bd = cb(f"{blk}.branch3x3dbl_3")(bd, stride=2)
    h = torch.cat([b3, bd, F.max_pool2d(h, 3, stride=2)], 1)

    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):  # C
        b1 = cb(f"{blk}.branch1x1")(h)
        b7 = cb(f"{blk}.branch7x7_1")(h)
        b7 = cb(f"{blk}.branch7x7_2")(b7, padding=(0, 3))
        b7 = cb(f"{blk}.branch7x7_3")(b7, padding=(3, 0))
        bd = cb(f"{blk}.branch7x7dbl_1")(h)
        bd = cb(f"{blk}.branch7x7dbl_2")(bd, padding=(3, 0))
        bd = cb(f"{blk}.branch7x7dbl_3")(bd, padding=(0, 3))
        bd = cb(f"{blk}.branch7x7dbl_4")(bd, padding=(3, 0))
        bd = cb(f"{blk}.branch7x7dbl_5")(bd, padding=(0, 3))
        bp = cb(f"{blk}.branch_pool")(avg3(h))
        h = torch.cat([b1, b7, bd, bp], 1)

    blk = "Mixed_7a"  # D
    b3 = cb(f"{blk}.branch3x3_2")(cb(f"{blk}.branch3x3_1")(h), stride=2)
    b7 = cb(f"{blk}.branch7x7x3_1")(h)
    b7 = cb(f"{blk}.branch7x7x3_2")(b7, padding=(0, 3))
    b7 = cb(f"{blk}.branch7x7x3_3")(b7, padding=(3, 0))
    b7 = cb(f"{blk}.branch7x7x3_4")(b7, stride=2)
    h = torch.cat([b3, b7, F.max_pool2d(h, 3, stride=2)], 1)

    for blk, pool in (("Mixed_7b", "avg"), ("Mixed_7c", "max")):  # E1/E2
        b1 = cb(f"{blk}.branch1x1")(h)
        b3 = cb(f"{blk}.branch3x3_1")(h)
        b3 = torch.cat([cb(f"{blk}.branch3x3_2a")(b3, padding=(0, 1)),
                        cb(f"{blk}.branch3x3_2b")(b3, padding=(1, 0))], 1)
        bd = cb(f"{blk}.branch3x3dbl_1")(h)
        bd = cb(f"{blk}.branch3x3dbl_2")(bd, padding=1)
        bd = torch.cat([cb(f"{blk}.branch3x3dbl_3a")(bd, padding=(0, 1)),
                        cb(f"{blk}.branch3x3dbl_3b")(bd, padding=(1, 0))], 1)
        if pool == "avg":
            bp = avg3(h)
        else:
            bp = F.max_pool2d(h, 3, stride=1, padding=1)
        bp = cb(f"{blk}.branch_pool")(bp)
        h = torch.cat([b1, b3, bd, bp], 1)

    return h.mean(dim=(2, 3))  # (B, 2048)


def test_inception_converter_roundtrip_and_torch_oracle(tmp_path):
    from spgan_tpu.evalkit.inception import (InceptionV3FID,
                                             load_torch_inception)

    rng = np.random.RandomState(0)
    sd = _make_synthetic_pt_inception_sd(rng)
    path = str(tmp_path / "pt_inception_synthetic.pth")
    torch.save(sd, path)

    params = load_torch_inception(path)
    # structural check against init()'s layout
    ref_struct = jax.tree_util.tree_structure(
        InceptionV3FID().init(jax.random.PRNGKey(0)))
    assert jax.tree_util.tree_structure(params) == ref_struct

    x = rng.uniform(-1, 1, (2, 3, 95, 95)).astype(np.float32)
    net = InceptionV3FID(resize_input=False)
    got = np.asarray(net.apply(params,
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    with torch.no_grad():
        want = _torch_fid_inception_pool3(sd, torch.from_numpy(x)).numpy()
    err = np.abs(got - want).max()
    scale = np.abs(want).max() + 1e-8
    assert err / scale < 1e-3, (err, scale)
