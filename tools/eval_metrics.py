#!/usr/bin/env python
"""Offline eval CLI: FID / Inception Score / LPIPS over image sets.

The reference ships these as importable libraries only (libs/fid.py,
libs/inception_score.py, libs/lpips/ — SURVEY notes them "standalone, not
wired into train.py/test.py"); this tool gives them a command-line surface
over the repo's JAX implementations (spgan_tpu/evalkit/*), running feature
extraction on the attached accelerator.

    # Frechet Inception Distance between two image sets
    python tools/eval_metrics.py fid SET_A SET_B \
        [--inception pt_inception-2015-12-05.pth] [--n 10000] [--batch 50]

    # Inception Score of one set (needs the fc head -> logits)
    python tools/eval_metrics.py is SET [--splits 10] [--inception ...]

    # mean pairwise LPIPS between aligned sets (same count, same size)
    python tools/eval_metrics.py lpips SET_A SET_B \
        --alex alexnet.pth --lin lpips_v0.1_alex.pth

    # precompute inception stats once (reference libs/calc_inception.py
    # __main__:76-116 saves {mean,cov} pkl; fid accepts the .pkl in place
    # of either set, like the reference's .fid-cache reuse, libs/fid.py:217-244)
    python tools/eval_metrics.py stats SET --out real_stats.pkl
    python tools/eval_metrics.py fid real_stats.pkl GEN_SET

SET = a folder of images | a packed .spr record file | a (N,H,W,3) .npy.
Inception weights resolve from --inception or $SPGAN_TPU_INCEPTION (the
same pytorch-fid checkpoint train-time FID uses, train/evals.py).
--allow-random-weights substitutes randomly initialized networks so the
plumbing can be exercised where the weight files are unavailable — the
resulting NUMBERS ARE MEANINGLESS and are labeled as such in the output.

Output: one JSON line per invocation.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spgan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _load_set(path: str, n=None) -> np.ndarray:
    """-> (N,H,W,3) uint8 (0..255).  Kept integer until batch time: a
    whole-set float32 copy at the documented --n 10000 scale would be tens
    of GB; _batches normalizes per batch instead."""
    if path.endswith(".npy"):
        arr = np.load(path, mmap_mode="r")
        arr = np.asarray(arr[:n] if n else arr)
    elif path.endswith(".spr"):
        from spgan_tpu.data.native_loader import read_records

        arr = np.asarray(read_records(path))
        if n:
            arr = arr[:n]
    elif os.path.isdir(path):
        from glob import glob

        from PIL import Image

        paths = sorted(p for p in glob(os.path.join(path, "*"))
                       if p.lower().endswith((".png", ".jpg", ".jpeg",
                                              ".webp")))
        assert paths, f"no images in {path}"
        if n:
            paths = paths[:n]
        arr = np.stack([np.asarray(Image.open(p).convert("RGB"))
                        for p in paths])
    else:
        raise SystemExit(f"unsupported image set {path!r} "
                         "(folder | .spr | .npy)")
    assert arr.dtype == np.uint8, (
        f"{path}: expected uint8 images (0..255), got {arr.dtype}")
    return arr


def _norm(b: np.ndarray) -> np.ndarray:
    return b.astype(np.float32) / 127.5 - 1.0


def _batches(arr: np.ndarray, batch: int):
    for i in range(0, arr.shape[0], batch):
        yield _norm(arr[i:i + batch])


def _inception_params(args, with_logits=False):
    path = args.inception or os.environ.get("SPGAN_TPU_INCEPTION")
    if path and os.path.exists(path):
        from spgan_tpu.evalkit.inception import load_torch_inception

        return load_torch_inception(path, with_logits=with_logits), True
    if not args.allow_random_weights:
        raise SystemExit(
            "no inception weights: pass --inception or set "
            "$SPGAN_TPU_INCEPTION to a pytorch-fid checkpoint "
            "(pt_inception-2015-12-05-*.pth), or pass "
            "--allow-random-weights for a meaningless smoke run")
    import jax

    from spgan_tpu.evalkit.inception import InceptionV3FID

    return InceptionV3FID(with_logits=with_logits).init(
        jax.random.PRNGKey(0)), False


def _set_stats(path, args, ev_box):
    """FIDStats for `path`: loaded directly when it is a precomputed .pkl,
    else extracted through inception.  ev_box lazily holds the evaluator so
    the network is only built (and weights only required) when at least one
    side is a raw image set."""
    from spgan_tpu.evalkit.fid import FIDStats

    if path.endswith(".pkl"):
        return FIDStats.load(path), True
    if ev_box[0] is None:
        from spgan_tpu.evalkit.fid import FIDEvaluator

        params, real_w = _inception_params(args)
        ev_box[0] = (FIDEvaluator(params), real_w)
    ev, real_w = ev_box[0]
    return ev.stats_from_batches(
        _batches(_load_set(path, args.n), args.batch)), real_w


def cmd_fid(args):
    from spgan_tpu.evalkit.fid import frechet_distance

    ev_box = [None]
    sa, wa = _set_stats(args.set_a, args, ev_box)
    sb, wb = _set_stats(args.set_b, args, ev_box)
    return {"metric": "fid", "value": frechet_distance(sa, sb),
            "n_a": int(sa.n), "n_b": int(sb.n),
            "real_weights": wa and wb}


def cmd_stats(args):
    from spgan_tpu.evalkit.fid import FIDEvaluator

    params, real_w = _inception_params(args)
    ev = FIDEvaluator(params)
    s = ev.stats_from_batches(
        _batches(_load_set(args.set_a, args.n), args.batch))
    s.save(args.out)
    return {"metric": "inception_stats", "out": args.out, "n": int(s.n),
            "real_weights": real_w}


def cmd_is(args):
    from spgan_tpu.evalkit.is_score import inception_score

    params, real_w = _inception_params(args, with_logits=True)
    imgs = _load_set(args.set_a, args.n)
    mean, std = inception_score(_batches(imgs, args.batch), params,
                                splits=args.splits)
    return {"metric": "inception_score", "value": mean, "std": std,
            "n": int(imgs.shape[0]), "splits": args.splits,
            "real_weights": real_w}


def cmd_lpips(args):
    import jax
    import jax.numpy as jnp

    from spgan_tpu.evalkit.lpips import LPIPS, load_torch_lpips

    spec = LPIPS()
    if args.alex and args.lin:
        params, real_w = load_torch_lpips(args.alex, args.lin), True
    elif not args.allow_random_weights:
        raise SystemExit(
            "no LPIPS weights: pass --alex (torchvision alexnet state "
            "dict) and --lin (lpips v0.1 alex.pth, as vendored by the "
            "reference at libs/lpips/weights/v0.1/alex.pth), or "
            "--allow-random-weights for a meaningless smoke run")
    else:
        params, real_w = spec.init(jax.random.PRNGKey(0)), False
    a = _load_set(args.set_a, args.n)
    b = _load_set(args.set_b, args.n)
    assert a.shape == b.shape, ("lpips compares ALIGNED sets pairwise",
                                a.shape, b.shape)
    fn = jax.jit(spec.apply)
    vals = []
    for i in range(0, a.shape[0], args.batch):
        d = fn(params, jnp.asarray(_norm(a[i:i + args.batch])),
               jnp.asarray(_norm(b[i:i + args.batch])))
        vals.append(np.asarray(d).reshape(-1))
    vals = np.concatenate(vals)
    return {"metric": "lpips", "value": float(vals.mean()),
            "std": float(vals.std()), "n": int(vals.shape[0]),
            "real_weights": real_w}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, two_sets in (("fid", True), ("is", False), ("lpips", True),
                           ("stats", False)):
        p = sub.add_parser(name)
        p.add_argument("set_a")
        if two_sets:
            p.add_argument("set_b")
        p.add_argument("--n", type=int, default=None,
                       help="cap the number of images per set")
        p.add_argument("--batch", type=int, default=50)
        p.add_argument("--allow-random-weights", action="store_true")
        if name in ("fid", "is", "stats"):
            p.add_argument("--inception", default=None)
        if name == "is":
            p.add_argument("--splits", type=int, default=1)
        if name == "lpips":
            p.add_argument("--alex", default=None)
            p.add_argument("--lin", default=None)
        if name == "stats":
            p.add_argument("--out", required=True,
                           help="output pickle path ({mu, sigma, n})")
    args = ap.parse_args(argv)
    out = {"fid": cmd_fid, "is": cmd_is, "lpips": cmd_lpips,
           "stats": cmd_stats}[args.cmd](args)
    if not out.get("real_weights", True):
        out["WARNING"] = "random network weights — value is meaningless"
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
