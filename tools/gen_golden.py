"""Generate golden .npz fixtures from the upstream reference implementation.

Run once (requires /root/reference mounted). The fixtures pin the *behavior* of
the reference's spherical-grid math so the JAX reimplementation can be verified
without importing any reference code at test time.

Sources pinned:
  - models/spherenet/grid_generator.py:GridGeneratorPatchCoordsFixBorder.createSamplingPattern
  - models/spherenet/grid_generator.py:GridGenerator.createSamplingPattern
  - coord_handler.py:SphereCoordHandlerV3BatchDiff._creat_coord_grid
"""
import sys
import numpy as np

sys.path.insert(0, "/root/reference")

import types

import torch  # noqa: E402

# coord_handler calls .cuda() on the const grid at construction; neuter it.
torch.Tensor.cuda = lambda self, *a, **k: self

# pkg_resources is absent in this env; grid_sample_grad_fix only needs
# parse_version for a torch-version check we don't exercise.
fake_pkg = types.ModuleType("pkg_resources")
fake_pkg.parse_version = lambda v: v
sys.modules.setdefault("pkg_resources", fake_pkg)

from models.spherenet.grid_generator import (  # noqa: E402
    GridGenerator,
    GridGeneratorPatchCoordsFixBorder,
    IncreIntervalGridGenerator,
)


def cp(p_x_st, p_x_ed, p_y_st, p_y_ed, circular, x_total, y_total,
       test_flag=False, partial=0.6667):
    d = {
        "p_x_st": p_x_st,
        "p_x_ed": p_x_ed,
        "p_y_st": p_y_st,
        "p_y_ed": p_y_ed,
        "circular_flag": circular,
        "x_total": x_total,
        "y_total": y_total,
        "partial": partial,
    }
    if test_flag:
        d["test_flag"] = True
    return d


def main():
    out = {}

    # --- patch-coords grid generator, training mode (third branch) ---
    # Matches shipped config: const grid 45x140, 35x35 crops.
    cases = []
    # training-style crops (x_st in [0,10), y_st in [0,140))
    for i, (x_st, y_st, circ) in enumerate(
        [(0, 0, False), (3, 50, False), (9, 105, False), (5, 120, True), (2, 139, True)]
    ):
        x_size = y_size = 35
        c = cp(
            p_x_st=x_st / 45,
            p_x_ed=(x_st + x_size - 1) / 45,
            p_y_st=y_st / 140,
            p_y_ed=(y_st + y_size - 1) / 140,
            circular=circ,
            x_total=45,
            y_total=140,
        )
        for hw in (35, 29, 23, 17):
            cases.append((f"train_{i}_hw{hw}", hw, hw, 3, c))

    # test mode (test_flag=True, partial honored), grids on the full test
    # latent field (x_total/y_total come from the meta coords field, 59x48)
    for i, (zx_st, zy_st, circ, xt, yt) in enumerate(
        [(0, 0, False, 59, 48), (6, 12, False, 59, 48), (12, 42, True, 59, 48),
         (18, 47, True, 59, 48)]
    ):
        x_size = y_size = 35
        c = cp(
            p_x_st=zx_st / xt,
            p_x_ed=(zx_st + x_size) / xt,
            p_y_st=zy_st / yt,
            p_y_ed=(zy_st + y_size) / yt,
            circular=circ,
            x_total=xt,
            y_total=yt,
            test_flag=True,
            partial=0.6667,
        )
        for hw in (35, 17, 29, 53):
            cases.append((f"test_{i}_hw{hw}", hw, hw, 3, c))

    for name, h, w, k, c in cases:
        gen = GridGeneratorPatchCoordsFixBorder(h, w, k, stride=1, coords_partial=c)
        pat = gen.createSamplingPattern()  # (1, H*Kh, W*Kw, 2) (lat, lon)
        out[f"patch_{name}"] = pat.astype(np.float64)
        out[f"patch_{name}_meta"] = np.array(
            [c["p_x_st"], c["p_x_ed"], c["p_y_st"], c["p_y_ed"],
             float(c["circular_flag"]), c["x_total"], c["y_total"],
             float(c.get("test_flag", False)), c["partial"], h, w, k],
            dtype=np.float64,
        )

    # --- presampled test modes (full_shape / pre_sample_mode branches) ---
    # close-loop-style windows over a 59x48 field, full_shape=(59,48)
    pre_cases = []
    for i, (zx, zy, circ) in enumerate(
        [(0, 0, False), (6, 12, False), (12, 42, True)]
    ):
        base = dict(
            p_x_st=zx / 59, p_x_ed=(zx + 36) / 59,
            p_y_st=zy / 48, p_y_ed=(zy + 36) / 48,
            circular_flag=circ, x_total=59, y_total=48,
            partial=0.6667, y_st=zy, y_ed=zy + 35,
        )
        c1 = dict(base, test_flag=True, full_shape=(59, 48))
        pre_cases.append((f"fullshape_{i}", c1))
        # pre_sample_mode needs len(lon_range)==35: ed=+1 ends
        c2 = dict(
            base, pre_sample_mode=True, full_shape=(59, 48),
            p_x_ed=(zx + 34) / 59, p_y_ed=(zy + 34) / 48,
        )
        pre_cases.append((f"presample_{i}", c2))
    for name, c in pre_cases:
        try:
            gen = GridGeneratorPatchCoordsFixBorder(35, 35, 3, stride=1,
                                                    coords_partial=c)
            pat = gen.createSamplingPattern()
            out[f"pre_{name}"] = pat.astype(np.float64)
            out[f"pre_{name}_meta"] = np.array(
                [c["p_x_st"], c["p_x_ed"], c["p_y_st"], c["p_y_ed"],
                 float(c["circular_flag"]), c["x_total"], c["y_total"],
                 float("test_flag" in c), float("pre_sample_mode" in c),
                 c["partial"]], dtype=np.float64)
        except AssertionError as e:
            print("skip", name, e)

    # --- global grid generator ---
    for name, h, w, k, s in [("g64", 16, 32, 3, 1), ("g_asym", 24, 48, 3, 1)]:
        gen = GridGenerator(h, w, k, stride=s)
        out[f"global_{name}"] = gen.createSamplingPattern().astype(np.float64)
        out[f"global_{name}_meta"] = np.array([h, w, k, s], dtype=np.float64)

    # --- IncreInterval grid generator (stride/upsample variants) ---
    for name, h, w, k, stride, ups in [
        ("s1", 16, 32, 3, 1, False),
        ("s2", 16, 32, 3, 2, False),
        ("up", 16, 32, 3, 1, True),
    ]:
        gen = IncreIntervalGridGenerator(h, w, k, stride=stride, upsample=ups)
        out[f"incre_{name}"] = gen.createSamplingPattern().astype(np.float64)
        out[f"incre_{name}_meta"] = np.array(
            [h, w, k, stride, float(ups)], dtype=np.float64)

    # --- coord handler const grid ---
    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    fake_ed = types.ModuleType("easydict")
    fake_ed.EasyDict = EasyDict
    sys.modules.setdefault("easydict", fake_ed)

    config = EasyDict(
        train_params=EasyDict(
            coord_num_dir=3,
            ss_n_layers=4,
            ss_unfold_radius=3,
            ts_input_size=11,
            coord_vert_sample_size=10,
            coord_hori_occupy_ratio=0.25,
            coord_vert_cut_pt=3,
            coord_continuous=True,
            ss_coord_all_layers="each_layer",
            partial=0.6667,
        )
    )
    from coord_handler import SphereCoordHandlerV3BatchDiff
    ch = SphereCoordHandlerV3BatchDiff(config)
    out["const_grid"] = ch.const_grid.cpu().numpy().astype(np.float64)
    out["const_grid_meta"] = np.array(
        [ch.const_grid_size_x, ch.const_grid_size_y], dtype=np.float64
    )
    out["coord_perturb_range"] = np.array(ch.coord_perturb_range, dtype=np.float64)

    # test-mode coord grid (used by the close-loop manager over the full field)
    tg = ch._creat_coord_grid(height=59, width=48)
    out["test_grid_59x48"] = tg.cpu().numpy().astype(np.float64)
    tg2 = ch._creat_coord_grid(height=35, width=35, coord_init=(3, 17))
    out["grid_init_35x35"] = tg2.cpu().numpy().astype(np.float64)

    np.savez_compressed("/root/repo/tests/golden/reference_grids.npz", **out)
    print("wrote", len(out), "arrays")


if __name__ == "__main__":
    main()
