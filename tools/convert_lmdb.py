#!/usr/bin/env python
"""Convert a reference-prepared LMDB dataset into an SPR1 record file.

The reference stores images in LMDB under keys f"{size}-{idx:0{5|8}d}" plus a
"length" key (reference prepare_data.py:100-175, dataset.py:388-610).

    python tools/convert_lmdb.py --lmdb /path/to/lmdb_dir --out data.spr \
        [--height 256 --width 768] [--key-prefix "[768, 256]"]

and the resulting .spr file is consumed here via
    data_params.source: spr,  data_params.folder: data.spr

Works with zero extra dependencies: when the python `lmdb` module is absent
(as in this runtime) the built-in pure-python parser of the LMDB on-disk
format is used instead (spgan_tpu/data/lmdb_read.py).  Alternatively skip
conversion entirely with data_params.source: lmdb pointing at the LMDB dir.
"""
import argparse
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmdb", required=True, help="LMDB directory")
    ap.add_argument("--out", required=True, help="output .spr path")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--key-prefix", default=None,
                    help="key prefix before '-<index>'; e.g. '256' or "
                         "'[768, 256]'. When omitted, EVERY matching "
                         "prefix is packed — a multi-resolution LMDB "
                         "(prepare_data resize_multiple) would duplicate "
                         "each image once per stored size, so pass the "
                         "prefix explicitly for those")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    try:
        import lmdb
    except ImportError:
        # zero-dependency fallback: the built-in pure-python parser of the
        # LMDB on-disk format (read-only — all this tool needs)
        from spgan_tpu.data import lmdb_read as lmdb

        print("[convert_lmdb] python `lmdb` module absent — using the "
              "built-in pure-python read-only parser "
              "(spgan_tpu/data/lmdb_read.py)")
    from PIL import Image

    from spgan_tpu.data.native_loader import write_records

    env = lmdb.open(args.lmdb, readonly=True, lock=False, readahead=False,
                    meminit=False)
    key_re = re.compile(rb"^(.*)-(\d{5,8})$")
    imgs = []
    with env.begin(write=False) as txn:
        n_declared = txn.get(b"length")
        if n_declared is not None:
            n_declared = int(n_declared.decode())
        cur = txn.cursor()
        for key, val in cur:
            m = key_re.match(key)
            if not m:
                continue
            if args.key_prefix is not None and \
                    m.group(1).decode() != args.key_prefix:
                continue
            img = Image.open(io.BytesIO(val)).convert("RGB")
            if (img.height, img.width) != (args.height, args.width):
                img = img.resize((args.width, args.height), Image.LANCZOS)
            imgs.append(np.asarray(img))
            if args.limit and len(imgs) >= args.limit:
                break
    assert imgs, "no image keys matched in the LMDB"
    if n_declared is not None and len(imgs) not in (n_declared, args.limit):
        print(f" [!] LMDB declares length={n_declared} but {len(imgs)} "
              "records decoded")
    arr = np.stack(imgs).astype(np.uint8)
    write_records(args.out, arr)
    print(f"wrote {arr.shape[0]} images ({args.height}x{args.width}) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
