"""Pallas tap-sampler kernel (training path) vs the XLA gather path:
forward equality, straight-through backward equality, and full
SphereStyledConv sample-mode equivalence including gradients."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spgan_tpu.geometry.coords import CoordsPartial
from spgan_tpu.geometry.sphere_conv import SphereStyledConv
from spgan_tpu.geometry.sphere_grid import (sphere_offset_tables_batch,
                                            sphere_patch_grid_batch)
from spgan_tpu.ops.grid_sample import bilinear_grid_sample, st_grid_sample_3x3
from spgan_tpu.ops.pallas.sphere_sample import (sphere_sample_taps,
                                                st_sample_taps)


def _cp(rng, b, grid_partial=0.8):
    st = rng.rand(b).astype(np.float32) * 0.3
    yst = rng.rand(b).astype(np.float32) * 0.5
    return CoordsPartial(
        p_x_st=jnp.asarray(st), p_x_ed=jnp.asarray(st + 0.5),
        p_y_st=jnp.asarray(yst), p_y_ed=jnp.asarray(yst + 0.4),
        circular=jnp.zeros((b,)), x_total=65, y_total=48,
        grid_partial=grid_partial)


def _tap_major(sampled, k=3):
    """(B, kH, kW, C) interleaved -> (B, k*k, H, W, C) tap-major."""
    b, kh, kw, c = sampled.shape
    h, w = kh // k, kw // k
    return sampled.reshape(b, h, k, w, k, c).transpose(
        0, 2, 4, 1, 3, 5).reshape(b, k * k, h, w, c)


@pytest.mark.parametrize("hw", [35, 17])
def test_sample_taps_matches_gather(hw, rng):
    B, C = 2, 8
    cp = _cp(rng, B)
    x = jnp.asarray(rng.randn(B, hw, hw, C).astype(np.float32))
    grid = sphere_patch_grid_batch(cp, hw, hw, 3)
    want = _tap_major(bilinear_grid_sample(x, grid))
    tables = sphere_offset_tables_batch(cp, hw, hw, 3)
    got = sphere_sample_taps(x, tables, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_st_sample_taps_backward_matches_xla_st(rng):
    """VJP w.r.t. z of the tap-major straight-through sampler equals the
    interleaved XLA straight-through sampler under the layout transpose."""
    B, H, C = 2, 17, 4
    cp = _cp(rng, B)
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
    grid = sphere_patch_grid_batch(cp, H, H, 3)
    tables = sphere_offset_tables_batch(cp, H, H, 3)
    cot = jnp.asarray(rng.randn(B, 3 * H, 3 * H, C).astype(np.float32))

    _, vjp_xla = jax.vjp(lambda z: st_grid_sample_3x3(z, grid), x)
    _, vjp_pal = jax.vjp(lambda z: st_sample_taps(z, tables), x)
    gx = vjp_xla(cot)[0]
    gp = vjp_pal(_tap_major(cot))[0]
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-5, rtol=1e-5)


def test_sphere_conv_sample_mode_fwd_and_grads(rng):
    """tables_mode='sample' reproduces the dense path: forward AND gradients
    w.r.t. input, weight and style (the training-relevant leaves)."""
    B, H = 2, 23
    local, coord, out, sd = 8, 3, 8, 16
    conv = SphereStyledConv(local_dim=local, coord_dim=coord, out_ch=out,
                            style_dim=sd)
    params = conv.init(jax.random.PRNGKey(0))
    # break the identity init so weight grads are not trivially symmetric
    params["conv"]["weight"] = params["conv"]["weight"] + 0.05 * jnp.asarray(
        rng.randn(*params["conv"]["weight"].shape).astype(np.float32))
    cp = _cp(rng, B)
    x = jnp.asarray(rng.randn(B, H, H, local).astype(np.float32))
    style = jnp.asarray(rng.randn(B, sd).astype(np.float32))
    coords = jnp.asarray(
        rng.rand(B, H, H, coord).astype(np.float32) * 40.0)
    tables = sphere_offset_tables_batch(cp, H, H, 3)

    def dense(x_, w_, s_):
        p = {"conv": dict(params["conv"], weight=w_)}
        return conv.apply(p, x_, s_, coords, cp)

    def sampled(x_, w_, s_):
        p = {"conv": dict(params["conv"], weight=w_)}
        return conv.apply(p, x_, s_, coords, cp, tables=tables,
                          tables_mode="sample")

    w0 = params["conv"]["weight"]
    y_d = dense(x, w0, style)
    y_s = sampled(x, w0, style)
    # conv vs einsum reduce in different orders; with the session-scoped rng
    # the data differs by test order, so bound by worst-case f32 noise
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_d),
                               atol=4e-4, rtol=2e-3)

    cot = jnp.asarray(rng.randn(*y_d.shape).astype(np.float32))
    loss = lambda f: lambda *a: (f(*a) * cot).sum()
    g_d = jax.grad(loss(dense), argnums=(0, 1, 2))(x, w0, style)
    g_s = jax.grad(loss(sampled), argnums=(0, 1, 2))(x, w0, style)
    for a, b, name in zip(g_s, g_d, ("x", "weight", "style")):
        a, b = np.asarray(a), np.asarray(b)
        # grads sum ~1e3 heavily-cancelling f32 products (conv vs einsum
        # reduce in different orders), so compare against the grad SCALE,
        # not element-wise relative error
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 2e-4, f"grad mismatch for {name}: rel-to-scale {err}"
