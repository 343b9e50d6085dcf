"""Interactive panorama editing REPL (`test.py ... --interactive`).

The reference parses `--interactive` (test.py:136) but ships no consumer —
the flag fed an unreleased external tool; the only released trace is the
batch_size==1 assert on the testing-vars pickle dump
(close_loop_infinite_generation.py:340-344).  This module provides a
working equivalent built on the tested programmatic primitives
(TestingVars.update_* + manager.regenerate, tests/test_interactive.py):
a line-oriented command loop that samples, edits, and partially
regenerates panoramas, and saves/loads the state bag.

Commands (also printed by `help`):
  gen [seed]                 sample fresh vars and render
  show                       re-render current vars and save a PNG
  reroll global [seed]       new global latent, full regenerate
  reroll region R0 C0 R1 C1 [seed]
                             resample the local latent in the z-space
                             rectangle [R0:R1, C0:C1) and regenerate only
                             the patches whose window overlaps it
  reroll noise [seed]        resample all noise fields, full regenerate
  place RECORDS.npz FRAC     paste an inversion record at FRAC of the width
                             (infer/inversion.py producer output)
  save PATH.npz / load PATH.npz
                             persist / restore the TestingVars bag
  quit                       exit

Designed to be driven by a script as well as a TTY: `run_interactive`
reads from any line iterator, so `test.py --interactive < script.txt`
works (and the unit test feeds an io.StringIO).
"""
from __future__ import annotations

import os
import shlex
from typing import IO, Optional

import numpy as np
import jax

from spgan_tpu.infer.testing_vars import TestingVars

HELP = __doc__[__doc__.index("Commands"):]


def _save_png(mgr, img: np.ndarray, save_root: str, tag: int) -> str:
    from spgan_tpu.infer.managers import save_image_batch

    return save_image_batch(img, save_root, start_id=tag)[0]


def run_interactive(mgr, save_root: str, stream: Optional[IO] = None,
                    out=print) -> int:
    """Drive `mgr` (a CloseLoop/Infinite manager, task_specific_init done)
    from `stream` (default stdin).  Returns the number of rendered images."""
    import sys

    stream = stream if stream is not None else sys.stdin
    os.makedirs(save_root, exist_ok=True)
    tv: Optional[TestingVars] = None
    n_rendered = 0
    seed_ctr = 0

    def render(full: bool = True, sel: Optional[np.ndarray] = None):
        nonlocal n_rendered
        img = (mgr.generate_with_vars(tv) if full
               else mgr.regenerate(tv, update_by_ss_map=sel))
        path = _save_png(mgr, img, save_root, n_rendered)
        n_rendered += 1
        out(f" [*] saved {path}")

    def key(tok, default_bump: int):
        nonlocal seed_ctr
        if tok is not None:
            return jax.random.PRNGKey(int(tok))
        seed_ctr += default_bump
        return jax.random.PRNGKey(seed_ctr)

    if hasattr(stream, "isatty") and stream.isatty():
        out(HELP)
    for line in stream:
        try:
            toks = shlex.split(line.strip())
            if not toks:
                continue
            cmd, args = toks[0], toks[1:]
            if cmd in ("quit", "exit", "q"):
                break
            elif cmd == "help":
                out(HELP)
            elif cmd == "gen":
                tv = mgr.create_vars(key(args[0] if args else None, 1))
                render(full=True)
            elif cmd == "show":
                assert tv is not None, "no vars yet — `gen` first"
                render(full=True)
            elif cmd == "reroll":
                assert tv is not None, "no vars yet — `gen` first"
                what = args[0]
                if what == "global":
                    k = key(args[1] if len(args) > 1 else None, 1)
                    gl = np.asarray(jax.random.normal(
                        k, tv.global_latent.shape[::2])).astype(
                        tv.global_latent.dtype)
                    tv.update_global_latent(
                        np.repeat(gl[:, None], 2, axis=1))
                    render(full=True)
                elif what == "region":
                    r0, c0, r1, c1 = (int(a) for a in args[1:5])
                    k = key(args[5] if len(args) > 5 else None, 1)
                    zh, zw = tv.local_latent.shape[1:3]
                    sel = np.zeros((zh, zw))
                    sel[r0:r1, c0:c1] = 1
                    new_z = np.array(tv.local_latent)
                    new_z[:, r0:r1, c0:c1] = np.asarray(jax.random.normal(
                        k, (new_z.shape[0], r1 - r0, c1 - c0,
                            new_z.shape[-1])))
                    tv.update_local_latent(new_z, sel)
                    render(full=False, sel=sel)
                elif what == "noise":
                    k = key(args[1] if len(args) > 1 else None, 1)
                    tv.update_noises([
                        np.asarray(jax.random.normal(
                            jax.random.fold_in(k, i), n.shape))
                        for i, n in enumerate(tv.noises)])
                    render(full=True)
                else:
                    out(f" [!] unknown reroll target {what!r}")
            elif cmd == "place":
                assert tv is not None, "no vars yet — `gen` first"
                rec_path, frac = args[0], float(args[1])
                d = np.load(rec_path)
                rec = {"local_latent": d["local_latent"],
                       "noises": [d[f"noise_{i}"] for i in
                                  range(len([k2 for k2 in d.files
                                             if k2.startswith("noise_")]))]}
                if "global_latent" in d:
                    rec["global_latent"] = d["global_latent"]
                tv.replace_by_records(mgr.plan, [rec], [frac])
                render(full=True)
            elif cmd == "save":
                assert tv is not None, "no vars yet — `gen` first"
                tv.save(args[0])
                out(f" [*] vars -> {args[0]}")
            elif cmd == "load":
                tv = TestingVars.load(args[0])
                out(f" [*] vars <- {args[0]}")
            else:
                out(f" [!] unknown command {cmd!r} — `help` lists them")
        except (AssertionError, ValueError, IndexError, KeyError,
                FileNotFoundError) as e:
            out(f" [!] {type(e).__name__}: {e}")
    return n_rendered
