#!/usr/bin/env python
"""Dataset preparation (reference prepare_data.py + gen_pano_dataset.py):

  1) cubemap faces -> equirect panos (in-repo projection, replaces the
     external cube2sphere tool):
       python tools/prepare_records.py cube2equirect --faces-root DIR --out DIR
  2) image folder -> packed SPR1 record file for the native loader:
       python tools/prepare_records.py pack --folder DIR --out data.spr \
              [--height 256 --width 768]
"""
import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cmd_pack(args):
    from PIL import Image

    from spgan_tpu.data.native_loader import read_records, write_records

    paths = sorted(p for p in glob(os.path.join(args.folder, "*"))
                   if p.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
    assert paths, f"no images in {args.folder}"
    imgs = []
    for p in paths:
        try:
            img = Image.open(p).convert("RGB")
        except OSError as e:
            # corruption scan analog of the reference's record re-check
            # (prepare_data.py:144-155): report and skip unreadable inputs
            print(f" [!] skipping corrupted input {p}: {e}")
            continue
        if (img.height, img.width) != (args.height, args.width):
            img = img.resize((args.width, args.height), Image.LANCZOS)
        imgs.append(np.asarray(img))
    assert imgs, "all inputs corrupted"
    arr = np.stack(imgs).astype(np.uint8)
    write_records(args.out, arr)
    if getattr(args, "verify", False):
        back = read_records(args.out)
        assert back.shape == arr.shape and (back == arr).all(), \
            f"verify failed: written record does not round-trip ({args.out})"
        print(f" [*] verified {back.shape[0]} records round-trip")
    print(f"wrote {arr.shape[0]} images ({args.height}x{args.width}) "
          f"-> {args.out}")


def _output_ok(path):
    """True if an existing output PNG decodes cleanly (corruption scan,
    reference prepare_data.py:144-155)."""
    from PIL import Image

    if not os.path.exists(path):
        return False
    try:
        Image.open(path).load()
        return True
    except OSError:
        return False


def cmd_cube2equirect(args):
    """Resume semantics mirror the reference's prepare_lmdb
    (prepare_data.py:107-158): an interrupted run restarts from where it
    left off (existing outputs are skipped), and --scan additionally
    re-validates every existing output and re-projects corrupted ones.
    --no-resume forces a full re-projection."""
    from PIL import Image

    from spgan_tpu.data.pano import FACES, cubemap_to_equirect

    scenes = sorted(os.listdir(args.faces_root))
    os.makedirs(args.out, exist_ok=True)
    n = skipped = fixed = 0
    for scene in scenes:
        sdir = os.path.join(args.faces_root, scene)
        if not os.path.isdir(sdir):
            continue
        out_path = os.path.join(args.out, f"{scene}.png")
        if getattr(args, "resume", True) and os.path.exists(out_path):
            if not getattr(args, "scan", False):
                skipped += 1
                continue
            if _output_ok(out_path):
                skipped += 1
                continue
            print(f" [!] corrupted output for {scene}, re-projecting")
            fixed += 1
        try:
            faces = {}
            for k in FACES:
                (path,) = glob(os.path.join(sdir, f"*{k}*"))
                faces[k] = np.asarray(Image.open(path).convert("RGB"))
        except ValueError:
            print(f" [!] skipping {scene}: faces not found")
            continue
        pano = cubemap_to_equirect(faces, width=args.width,
                                   height=args.height,
                                   edge_cutoff_ratio=args.cutoff)
        Image.fromarray(pano).save(out_path)
        n += 1
    if skipped or fixed:
        print(f" [*] resume: skipped {skipped} existing, "
              f"re-projected {fixed} corrupted")
    print(f"projected {n} scenes -> {args.out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pack")
    p.add_argument("--folder", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--verify", action="store_true",
                   help="read the written record back and compare")
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("cube2equirect")
    p.add_argument("--faces-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--cutoff", type=float, default=0.6667)
    p.add_argument("--no-resume", dest="resume", action="store_false",
                   help="re-project even when the output already exists")
    p.add_argument("--scan", action="store_true",
                   help="validate existing outputs; re-project corrupted")
    p.set_defaults(fn=cmd_cube2equirect)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
