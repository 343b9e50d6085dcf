"""Generate a WHOLE-PANORAMA parity fixture from the reference pipeline.

Runs the ACTUAL reference close-loop test manager
(test_managers/close_loop_infinite_generation.py:73-305) end-to-end on CPU —
its latent sampler, its coord handler, its per-patch python loop, its
overwrite scatter (base_test_manager.py:305-325) — with a reduced-dims
randomly-initialized generator (batch 1: the reference's deal_coords grouped
conv crosses sample boundaries at B>1, see tools/gen_golden_forward.py), and
dumps {state_dict, the exact latent/noise fields the manager used, the
stitched meta image}.

tests/test_pano_parity.py imports the weights, injects the identical fields
into the jitted PanoramaEngine, and bounds the stitched 384x768 output error —
the last uncovered correctness surface (VERDICT r2 Missing #1): any off-by-one
in test-mode coords_partial construction or noise slicing changes the product
here and nowhere else.

Reuses the import-time stubs of tools/gen_golden_forward.py (CPU custom_ops
fallback math, easydict/lmdb/torchvision shims).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_golden_forward as gf  # installs the reference stubs on import

import torch  # noqa: E402

EasyDict = gf.EasyDict


def main():
    import argparse
    import random

    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/spgan_reference_pano.npz")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--planar", action="store_true",
                    help="attempt the PLANAR InfiniteGenerationManager "
                         "(test_managers/infinite_generation.py:25-208). "
                         "NOTE: this CRASHES by reference design — the "
                         "planar manager passes override_coords without "
                         "coords_partial_override and the SP-GAN coord "
                         "handler asserts (coord_handler.py:1071); see "
                         "tests/test_pano_parity.py::"
                         "test_planar_manager_reference_incompatible")
    args = ap.parse_args()

    random.seed(0)
    np.random.seed(0)
    torch.manual_seed(0)

    config = gf.make_config(full_size=False, ss_mapping=False)
    config.train_params.batch_size = 1
    manager_path = (
        "test_managers.infinite_generation.InfiniteGenerationManager"
        if args.planar else
        "test_managers.close_loop_infinite_generation."
        "InfiniteGenerationManagerPatchCoordsCloseLoop")
    config.task = EasyDict(
        task_manager=manager_path,
        interactive=False, seed=9000,
        height=args.height, width=args.width,
        batch_size=1, num_gen=1, lowres_height=128)
    config.var = EasyDict(dataparallel=False, exp_name="golden_pano")

    from models.spgan import spgan as spgan_mod

    g_ema = spgan_mod.InfinityGanGenerator(config)
    g_ema.eval()

    save_root = "/tmp/golden_pano_out"
    os.makedirs(save_root, exist_ok=True)
    if args.planar:
        from test_managers.infinite_generation import (
            InfiniteGenerationManager)

        manager = InfiniteGenerationManager(g_ema, "cpu", save_root, config)
    else:
        from test_managers.close_loop_infinite_generation import (
            InfiniteGenerationManagerPatchCoordsCloseLoop)

        manager = InfiniteGenerationManagerPatchCoordsCloseLoop(
            g_ema, "cpu", save_root, config)
    manager.task_specific_init()

    torch.manual_seed(9000)
    np.random.seed(9000)
    with torch.no_grad():
        testing_vars = manager.create_vars()
        # record the fields BEFORE generate touches them
        payload = {
            "global_latent": testing_vars.global_latent.numpy().copy(),
            "local_latent": testing_vars.local_latent.numpy().copy(),
            "meta_coords": testing_vars.meta_coords.numpy().copy(),
            "n_noises": np.array(len(testing_vars.noises)),
        }
        for i, n in enumerate(testing_vars.noises):
            payload[f"noise_{i}"] = n.numpy().copy()
        manager.generate(testing_vars, disable_pbar=True)

    meta = testing_vars.meta_img.numpy()
    payload["meta_img"] = meta
    payload["meta_hw"] = np.array([manager.meta_height, manager.meta_width])
    payload["target_hw"] = np.array([args.height, args.width])
    payload["meta"] = np.array([
        config.train_params.global_latent_dim,
        config.train_params.local_latent_dim,
        config.train_params.n_mlp, 0])
    for k, v in g_ema.state_dict().items():
        payload["sd__" + k] = v.numpy()

    np.savez_compressed(args.out, **payload)
    print(f"saved pano fixture: meta {meta.shape}, "
          f"{len(list(g_ema.state_dict()))} tensors -> {args.out}")


if __name__ == "__main__":
    main()
