"""Parity of the vectorized JAX grid generator against golden outputs captured
from the reference numpy implementation (tools/gen_golden.py)."""
import numpy as np
import pytest

from spgan_tpu.geometry.sphere_grid import global_sphere_pattern, sphere_patch_grid
from spgan_tpu.geometry.coords import CoordGrid


def _patch_cases(golden):
    for key in golden.files:
        if key.startswith("patch_") and not key.endswith("_meta"):
            yield key, golden[key], golden[key + "_meta"]


def test_patch_grid_parity(golden):
    n = 0
    for key, pat, meta in _patch_cases(golden):
        (p_x_st, p_x_ed, p_y_st, p_y_ed, circ, x_total, y_total,
         test_flag, partial, h, w, k) = meta
        grid_partial = partial if test_flag else 0.8
        got = np.asarray(sphere_patch_grid(
            p_x_st, p_x_ed, p_y_st, p_y_ed, circ, grid_partial,
            h=int(h), w=int(w), k=int(k),
            x_total=int(x_total), y_total=int(y_total)))
        # golden stores pixel-unit (lat, lon); convert to normalized (gx, gy)
        lat_norm = pat[0, :, :, 0] / x_total * 2 - 1
        lon_norm = pat[0, :, :, 1] / y_total * 2 - 1
        want = np.stack([lon_norm, lat_norm], axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=key)
        n += 1
    assert n >= 30


def test_global_pattern_parity(golden):
    for name in ("g64", "g_asym"):
        h, w, k, s = golden[f"global_{name}_meta"].astype(int)
        got = global_sphere_pattern(h, w, k, s)
        want = golden[f"global_{name}"]
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=name)


def test_const_grid_parity(golden):
    cg = CoordGrid()
    want = golden["const_grid"]  # (3, 45, 140) CHW
    got = cg.base_grid().transpose(2, 0, 1)
    assert golden["const_grid_meta"].astype(int).tolist() == [45, 140]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_perturb_range_parity(golden):
    got = CoordGrid().perturb_ranges()
    np.testing.assert_allclose(got, golden["coord_perturb_range"], atol=1e-7)


def test_test_field_parity(golden):
    cg = CoordGrid()
    want = golden["test_grid_59x48"]
    got = cg.base_grid(height=59, width=48).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_grid_with_init_parity(golden):
    cg = CoordGrid()
    want = golden["grid_init_35x35"]
    got = cg.base_grid(height=35, width=35, coord_init=(3, 17)).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_incre_interval_pattern_parity(golden):
    from spgan_tpu.geometry.sphere_grid import incre_interval_pattern

    for name in ("incre_s1", "incre_s2", "incre_up"):
        if name not in golden.files:
            pytest.skip("older golden fixture without IncreInterval cases")
        h, w, k, stride, ups = golden[f"{name}_meta"]
        got = incre_interval_pattern(int(h), int(w), int(k), int(stride),
                                     bool(ups))
        np.testing.assert_allclose(got, golden[name], atol=1e-6, err_msg=name)


def test_presampled_modes_parity(golden):
    from spgan_tpu.geometry.sphere_grid import sphere_patch_grid_presampled

    n = 0
    for key in golden.files:
        if not key.startswith("pre_") or key.endswith("_meta"):
            continue
        (pxs, pxe, pys, pye, circ, xt, yt, tflag, pmode,
         partial) = golden[key + "_meta"]
        # the reference honors cp.partial only under test_flag
        # (grid_generator.py:164-167); otherwise 0.8
        eff_partial = float(partial) if tflag else 0.8
        got = sphere_patch_grid_presampled(
            pxs, pxe, pys, pye, bool(circ), eff_partial,
            full_shape=(59, 48), k=3, x_total=int(xt), y_total=int(yt),
            pre_sample_mode=bool(pmode))
        pat = golden[key]
        lat_norm = pat[0, :, :, 0] / xt * 2 - 1
        lon_norm = pat[0, :, :, 1] / yt * 2 - 1
        want = np.stack([lon_norm, lat_norm], axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=key)
        n += 1
    assert n == 6
