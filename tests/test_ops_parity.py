"""Numerical parity of the NHWC/XLA op library against PyTorch-CPU oracles
that implement the reference's math (grouped modulated conv, conv_transpose
upsample path, FIR resampling, bilinear grid_sample)."""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from spgan_tpu.ops.linear import EqualLinear, fused_leaky_relu
from spgan_tpu.ops.upfirdn import Blur, Upsample, Downsample, make_kernel
from spgan_tpu.ops.modulated import ModulatedConv2d, ToRGB
from spgan_tpu.ops.grid_sample import bilinear_grid_sample, st_grid_sample_3x3

ATOL = 2e-4


def nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def to_oihw(w_hwio):
    # (k,k,in,out) -> (out,in,k,k)
    return torch.from_numpy(np.asarray(w_hwio).transpose(3, 2, 0, 1).copy())


def test_equal_linear_fused_lrelu(rng):
    spec = EqualLinear(16, 8, bias_init=1.0, lr_mul=0.01, activation="fused_lrelu")
    params = spec.init(jax.random.PRNGKey(0))
    x = rng.randn(4, 16).astype(np.float32)
    got = np.asarray(spec.apply(params, jnp.asarray(x)))

    w = torch.from_numpy(np.asarray(params["weight"]).T.copy())  # (out,in)
    b = torch.from_numpy(np.asarray(params["bias"]))
    scale = (1 / math.sqrt(16)) * 0.01
    out = F.linear(torch.from_numpy(x), w * scale)
    out = F.leaky_relu(out + b * 0.01, 0.2) * math.sqrt(2)
    np.testing.assert_allclose(got, out.numpy(), atol=ATOL)


def test_blur_pad(rng):
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    bl = Blur(kernel=(1, 2, 1), pad=(1, 1))
    got = np.asarray(bl(jnp.asarray(x)))
    k = torch.from_numpy(make_kernel([1, 2, 1]))
    xt = nchw(x)
    b, c, h, w = xt.shape
    xt = F.pad(xt.reshape(b * c, 1, h, w), (1, 1, 1, 1))
    out = F.conv2d(xt, torch.flip(k, (0, 1)).reshape(1, 1, 3, 3))
    out = out.reshape(b, c, h, w)
    np.testing.assert_allclose(got, nhwc(out), atol=ATOL)


def test_upsample_no_zero_pad(rng):
    """Reference models/ops.py:52-57: conv_transpose(k*(4), stride 2) then
    crop 1px -> output 2H-1."""
    x = rng.randn(2, 11, 11, 3).astype(np.float32)
    up = Upsample(kernel=(1, 2, 1), no_zero_pad=True)
    got = np.asarray(up(jnp.asarray(x)))
    assert got.shape == (2, 21, 21, 3)

    k = torch.from_numpy(make_kernel([1, 2, 1]) * 4)
    xt = nchw(x)
    b, c, h, w = xt.shape
    out = F.conv_transpose2d(xt.reshape(b * c, 1, h, w),
                             k.reshape(1, 1, 3, 3), stride=2)
    out = out.reshape(b, c, out.shape[-2], out.shape[-1])[:, :, 1:-1, 1:-1]
    np.testing.assert_allclose(got, nhwc(out), atol=ATOL)


def test_downsample(rng):
    x = rng.randn(2, 12, 12, 4).astype(np.float32)
    dn = Downsample(kernel=(1, 3, 3, 1))
    got = np.asarray(dn(jnp.asarray(x)))
    k2 = make_kernel([1, 3, 3, 1])
    p = 4 - 2
    pad0, pad1 = (p + 1) // 2, p // 2
    xt = nchw(x)
    b, c, h, w = xt.shape
    xt = F.pad(xt.reshape(b * c, 1, h, w), (pad0, pad1, pad0, pad1))
    out = F.conv2d(xt, torch.flip(torch.from_numpy(k2), (0, 1)).reshape(1, 1, 4, 4),
                   stride=2)
    out = out.reshape(b, c, out.shape[-2], out.shape[-1])
    np.testing.assert_allclose(got, nhwc(out), atol=ATOL)


def _torch_modconv_grouped(x, w_hwio, s, scale, demodulate, upsample,
                           no_zero_pad=True):
    """The reference's grouped formulation (models/ops.py:597-636)."""
    xt = nchw(x)
    batch, in_ch, H, W = xt.shape
    weight = to_oihw(w_hwio).unsqueeze(0)  # (1,out,in,k,k)
    out_ch = weight.shape[1]
    style = torch.from_numpy(np.asarray(s)).view(batch, 1, in_ch, 1, 1)
    w = scale * weight * style
    if demodulate:
        demod = torch.rsqrt(w.pow(2).sum([2, 3, 4]) + 1e-8)
        w = w * demod.view(batch, out_ch, 1, 1, 1)
    ks = weight.shape[-1]
    w = w.view(batch * out_ch, in_ch, ks, ks)
    if upsample:
        xt = xt.reshape(1, batch * in_ch, H, W)
        w = w.view(batch, out_ch, in_ch, ks, ks).transpose(1, 2).reshape(
            batch * in_ch, out_ch, ks, ks)
        out = F.conv_transpose2d(xt, w, padding=0, stride=2, groups=batch)
        if no_zero_pad:
            out = out[:, :, 1:-1, 1:-1]
        out = out.view(batch, out_ch, out.shape[-2], out.shape[-1])
        # blur kernel [1,2,1]*4, valid
        k = torch.from_numpy(make_kernel([1, 2, 1]) * 4)
        b, c, h2, w2 = out.shape
        out = F.conv2d(out.reshape(b * c, 1, h2, w2),
                       torch.flip(k, (0, 1)).reshape(1, 1, 3, 3))
        out = out.reshape(b, c, out.shape[-2], out.shape[-1])
    else:
        pad = 0 if no_zero_pad else ks // 2
        xt = xt.reshape(1, batch * in_ch, H, W)
        out = F.conv2d(xt, w, padding=pad, groups=batch)
        out = out.view(batch, out_ch, out.shape[-2], out.shape[-1])
    return nhwc(out)


@pytest.mark.parametrize("upsample", [False, True])
def test_modulated_conv_parity(rng, upsample):
    spec = ModulatedConv2d(in_ch=8, out_ch=6, kernel_size=3, style_dim=12,
                           demodulate=True, upsample=upsample, no_zero_pad=True)
    params = spec.init(jax.random.PRNGKey(1))
    x = rng.randn(4, 13, 13, 8).astype(np.float32)
    style = rng.randn(4, 12).astype(np.float32)
    got = np.asarray(spec.apply(params, jnp.asarray(x), jnp.asarray(style)))

    s = np.asarray(spec.style_scale(params, jnp.asarray(style)))
    want = _torch_modconv_grouped(x, params["weight"], s, spec.scale,
                                  True, upsample)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_modulated_conv_k1_no_demod(rng):
    spec = ModulatedConv2d(in_ch=8, out_ch=3, kernel_size=1, style_dim=12,
                           demodulate=False, no_zero_pad=True)
    params = spec.init(jax.random.PRNGKey(2))
    x = rng.randn(2, 7, 7, 8).astype(np.float32)
    style = rng.randn(2, 12).astype(np.float32)
    got = np.asarray(spec.apply(params, jnp.asarray(x), jnp.asarray(style)))
    s = np.asarray(spec.style_scale(params, jnp.asarray(style)))
    want = _torch_modconv_grouped(x, params["weight"], s, spec.scale,
                                  False, False)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_grid_sample_parity(rng):
    x = rng.randn(2, 9, 11, 5).astype(np.float32)
    grid = (rng.rand(2, 13, 7, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    got = np.asarray(bilinear_grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    want = F.grid_sample(nchw(x), torch.from_numpy(grid),
                         align_corners=True, mode="bilinear",
                         padding_mode="border")
    np.testing.assert_allclose(got, nhwc(want), atol=ATOL)


def test_st_grid_sample_forward_and_grad(rng):
    """Forward == bilinear; VJP w.r.t. z == 0.1 * 3x3 block-mean of cotangent
    (reference grid_generator.py:615-623)."""
    z = rng.randn(2, 5, 6, 4).astype(np.float32)
    grid = (rng.rand(2, 15, 18, 2).astype(np.float32) * 2 - 1)
    zj, gj = jnp.asarray(z), jnp.asarray(grid)
    got = np.asarray(st_grid_sample_3x3(zj, gj))
    want = np.asarray(bilinear_grid_sample(zj, gj))
    np.testing.assert_allclose(got, want, atol=1e-6)

    ct = rng.randn(2, 15, 18, 4).astype(np.float32)
    _, vjp = jax.vjp(lambda zz: st_grid_sample_3x3(zz, gj), zj)
    (gz,) = vjp(jnp.asarray(ct))
    want_g = ct.reshape(2, 5, 3, 6, 3, 4).mean(axis=(2, 4)) * 0.1
    np.testing.assert_allclose(np.asarray(gz), want_g, atol=1e-6)

    # grid gets no gradient
    _, vjp_g = jax.vjp(lambda gg: st_grid_sample_3x3(zj, gg), gj)
    (ggrad,) = vjp_g(jnp.asarray(ct))
    np.testing.assert_allclose(np.asarray(ggrad), 0.0, atol=0)

    # double-grad must work (R1/PPL path) — custom_vjp would fail here
    def f(zz):
        return jnp.sum(st_grid_sample_3x3(zz, gj) ** 2)

    jax.grad(lambda zz: jnp.sum(jax.grad(f)(zz) ** 2))(zj)


def test_torgb_skip(rng):
    spec = ToRGB(in_ch=8, style_dim=12, upsample=True, no_zero_pad=True)
    params = spec.init(jax.random.PRNGKey(3))
    x = rng.randn(2, 9, 9, 8).astype(np.float32)
    style = rng.randn(2, 12).astype(np.float32)
    skip = rng.randn(2, 5, 5, 3).astype(np.float32)
    out = np.asarray(spec.apply(params, jnp.asarray(x), jnp.asarray(style),
                                jnp.asarray(skip)))
    # upsampled skip: 2*5-1 = 9 == out spatial
    assert out.shape == (2, 9, 9, 3)


def test_spatial_style_mono_equals_vector(rng):
    """A spatially-constant 4-D style must reproduce the vector-style path
    exactly (reference falls back via is_mono_style, ops.py:591-595; the
    scale-input math makes them identical by construction)."""
    spec = ModulatedConv2d(in_ch=8, out_ch=6, kernel_size=3, style_dim=12,
                           demodulate=True, no_zero_pad=True)
    params = spec.init(jax.random.PRNGKey(4))
    x = jnp.asarray(rng.randn(2, 9, 9, 8).astype(np.float32))
    sv = rng.randn(2, 12).astype(np.float32)
    s4 = jnp.tile(jnp.asarray(sv)[:, None, None, :], (1, 9, 9, 1))
    a = np.asarray(spec.apply(params, x, jnp.asarray(sv)))
    b = np.asarray(spec.apply(params, x, s4))
    np.testing.assert_allclose(a, b, atol=2e-5)

    up = ModulatedConv2d(in_ch=8, out_ch=6, kernel_size=3, style_dim=12,
                         demodulate=True, upsample=True, no_zero_pad=True)
    pu = up.init(jax.random.PRNGKey(5))
    a = np.asarray(up.apply(pu, x, jnp.asarray(sv)))
    b = np.asarray(up.apply(pu, x, s4))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_spatial_style_fusion_varies(rng):
    spec = ModulatedConv2d(in_ch=8, out_ch=6, kernel_size=3, style_dim=12,
                           demodulate=True, no_zero_pad=True)
    params = spec.init(jax.random.PRNGKey(6))
    x = jnp.asarray(rng.randn(1, 9, 9, 8).astype(np.float32))
    s1 = rng.randn(1, 12).astype(np.float32)
    s2 = rng.randn(1, 12).astype(np.float32)
    fused = jnp.concatenate([
        jnp.tile(jnp.asarray(s1)[:, None, None], (1, 9, 5, 1)),
        jnp.tile(jnp.asarray(s2)[:, None, None], (1, 9, 4, 1)),
    ], axis=2)
    out = np.asarray(spec.apply(params, x, fused))
    left = np.asarray(spec.apply(params, x, jnp.asarray(s1)))
    right = np.asarray(spec.apply(params, x, jnp.asarray(s2)))
    # interior of each half matches the corresponding pure style
    np.testing.assert_allclose(out[:, :, :2], left[:, :, :2], atol=1e-5)
    np.testing.assert_allclose(out[:, :, -2:], right[:, :, -2:], atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_conv_transpose2_phase_decomposition(rng, k):
    """The phase-decomposed stride-2 transposed conv (_conv_transpose2_phase,
    the alternative for backends with weak base-dilated convs) equals the
    production lhs_dilation form to FP-reduction-order noise (every dropped
    tap multiplies an exact zero; summation order over (tap, channel) may
    differ per backend), including grads w.r.t. both input and weight
    (R1/PPL double-grad safety)."""
    from spgan_tpu.ops.modulated import (
        _conv_transpose2 as _conv_transpose2_dilated,
        _conv_transpose2_phase as _conv_transpose2)

    x = jnp.asarray(rng.randn(2, 7, 9, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 5, 4).astype(np.float32))

    y_phase = jax.jit(_conv_transpose2)(x, w)
    y_ref = jax.jit(_conv_transpose2_dilated)(x, w)
    assert y_phase.shape == y_ref.shape == (2, 2 * 7 + k - 2, 2 * 9 + k - 2, 4)
    np.testing.assert_allclose(np.asarray(y_phase), np.asarray(y_ref),
                               atol=1e-5)

    # torch oracle for absolute semantics (conv_transpose2d s=2 p=0)
    yt = F.conv_transpose2d(nchw(x), torch.from_numpy(
        np.asarray(w).transpose(2, 3, 0, 1).copy()), stride=2)
    np.testing.assert_allclose(np.asarray(y_phase), nhwc(yt), atol=ATOL)

    def loss_phase(x_, w_):
        return jnp.sum(jnp.sin(_conv_transpose2(x_, w_)))

    def loss_ref(x_, w_):
        return jnp.sum(jnp.sin(_conv_transpose2_dilated(x_, w_)))

    gx_p, gw_p = jax.grad(loss_phase, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=1e-4, rtol=1e-4)

    # second-order (R1-style): grad-of-grad-norm through the transposed conv
    def gnorm(fn):
        return lambda x_: jnp.sum(jnp.square(jax.grad(
            lambda a: jnp.sum(jnp.tanh(fn(a, w))))(x_)))

    hx_p = jax.grad(gnorm(_conv_transpose2))(x)
    hx_r = jax.grad(gnorm(_conv_transpose2_dilated))(x)
    np.testing.assert_allclose(np.asarray(hx_p), np.asarray(hx_r),
                               atol=1e-3, rtol=1e-3)
