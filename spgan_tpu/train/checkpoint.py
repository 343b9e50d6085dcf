"""Checkpoint save/resume via Orbax.

Reference parity (train.py:627-639, 884-957; utils.py:129-134):
  * rolling checkpoints with max_to_keep=2 (rm_outdated_ckpt behavior)
  * auto-resume from the newest checkpoint
  * best-FID snapshot saved separately
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from spgan_tpu.train.state import TrainState


class CheckpointLayoutError(RuntimeError):
    """A checkpoint's pytree layout does not match the current TrainState.

    The usual cause is a code change to the optimizer state layout (e.g. the
    round-4 switch from optax.adam's shared count to torch_adam's per-leaf
    counts) making older checkpoints non-restorable.  Raised instead of the
    raw Orbax tree error so resume failures name the actual problem
    (reference resume robustness: train.py:922-951)."""


def _keypaths(tree) -> set:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p) for p, _ in leaves}


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 2):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None):
        del extra  # metadata lives in the state itself (step, ppl mean)
        self._mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template_state: TrainState,
                step: Optional[int] = None) -> Tuple[TrainState, dict]:
        step = step if step is not None else self.latest_step()
        assert step is not None, "no checkpoint found"
        try:
            payload = self._mgr.restore(
                step, args=ocp.args.StandardRestore({"state": template_state}))
        except Exception as e:  # diagnose layout drift before re-raising
            try:
                saved = _keypaths(self._mgr.restore(step))
            except Exception:
                raise e
            want = _keypaths({"state": template_state})
            missing = sorted(want - saved)[:8]
            extra = sorted(saved - want)[:8]
            if not missing and not extra:
                raise e
            opt_hint = any(".opt_g" in k or ".opt_d" in k
                           for k in missing + extra)
            raise CheckpointLayoutError(
                f"checkpoint at step {step} in {self.ckpt_dir} has a stale "
                f"pytree layout: {len(missing)} paths expected by the "
                f"current TrainState are absent (first: {missing}), "
                f"{len(extra)} saved paths are no longer expected "
                f"(first: {extra})."
                + (" The differing paths are in the OPTIMIZER state — this "
                   "checkpoint predates an optimizer layout change (e.g. the "
                   "optax.adam -> torch_adam per-leaf-count switch); delete "
                   "the stale checkpoint directory or restart training from "
                   "scratch." if opt_hint else "")) from e
        return payload["state"], {}


def save_best(ckpt_root: str, name: str, state: TrainState):
    path = os.path.join(os.path.abspath(ckpt_root), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
