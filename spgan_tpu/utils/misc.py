"""Small utilities (reference utils.py analogues)."""
from __future__ import annotations

import importlib
import os
import random
import time
from typing import Any


# The reference's own dotted-path strings (its configs/*.yaml) resolve to
# the equivalent spgan_tpu classes, so an unmodified reference YAML works.
REFERENCE_PATH_ALIASES = {
    "models.spgan.spgan.InfinityGanGenerator":
        "spgan_tpu.models.generator.Generator",
    "models.stylegan2discriminator.StyleGan2Discriminator":
        "spgan_tpu.models.discriminator.Discriminator",
    "test_managers.close_loop_infinite_generation."
    "InfiniteGenerationManagerPatchCoordsCloseLoop":
        "spgan_tpu.infer.close_loop.CloseLoopPanoramaManager",
    "test_managers.infinite_generation.InfiniteGenerationManager":
        "spgan_tpu.infer.infinite.InfiniteGenerationManager",
}


def import_func(dotted: str) -> Any:
    """Resolve a dotted-path class/function string
    (reference utils.py:293-297 — used for g_arch/d_arch/task_manager).
    Reference-repo paths are aliased to their spgan_tpu equivalents."""
    dotted = REFERENCE_PATH_ALIASES.get(dotted, dotted)
    module, name = dotted.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def manually_seed(seed: int) -> None:
    """(reference utils.py:466-469) — numpy/python; jax keys are explicit."""
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


def sync_fetch(tree: Any) -> float:
    """Completion barrier: fetch one scalar PER DEVICE SHARD of `tree`'s
    first leaf to the host and return the last one.  On the remote-attached
    axon TPU runtime `block_until_ready()` returns EARLY (measured in
    tools/bench_sampler.py: ~8 ms reported for a step whose math
    lower-bounds at ~50 ms); a host value fetch is the only trustworthy
    barrier.  Each device executes chained programs in dispatch order, so
    fetching one element of the LAST output dispatched to a device bounds
    everything dispatched before it ON THAT DEVICE — a sharded value (e.g.
    a width-sharded panorama lattice) therefore needs one fetch per
    addressable shard, not one global element (which only covers the shard
    that owns it).  Use this for every timing/trace boundary."""
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    shards = getattr(leaf, "addressable_shards", None)
    if not shards:  # numpy / non-jax leaf: nothing in flight
        import numpy as np

        return float(np.ravel(np.asarray(leaf))[0])
    val = 0.0
    for s in shards:  # s.data is committed to one device; the tiny
        # ravel()[0] program runs there and its fetch drains that queue
        val = float(jax.numpy.ravel(s.data)[0])
    return val


def backup_files(cur_dir: str, backup_dir: str,
                 exts=(".py", ".cc", ".yaml", ".yml")) -> int:
    """Snapshot source files into the experiment dir for reproducibility
    (reference libs/backup.py:28-42)."""
    import shutil

    n = 0
    for root, dirs, files in os.walk(cur_dir):
        dirs[:] = [d for d in dirs
                   if d not in {".git", "logs", "__pycache__", "tests",
                                ".fid-cache"}]
        for f in files:
            if f.endswith(exts):
                src = os.path.join(root, f)
                rel = os.path.relpath(src, cur_dir)
                dst = os.path.join(backup_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
                n += 1
    return n


class FileLock:
    """Advisory lock-file around shared log writes
    (reference utils.py:482-560)."""

    def __init__(self, path: str, timeout: float = 30.0, poll: float = 0.1):
        self.lock_path = path + ".lock"
        self.timeout = timeout
        self.poll = poll
        self._fd = None

    def __enter__(self):
        deadline = time.time() + self.timeout
        while True:
            try:
                self._fd = os.open(self.lock_path,
                                   os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                if time.time() > deadline:
                    # stale lock — steal it
                    try:
                        os.unlink(self.lock_path)
                    except FileNotFoundError:
                        pass
                time.sleep(self.poll)

    def __exit__(self, *exc):
        if self._fd is not None:
            os.close(self._fd)
            try:
                os.unlink(self.lock_path)
            except FileNotFoundError:
                pass
        return False
