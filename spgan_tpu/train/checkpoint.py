"""Checkpoint save/resume via Orbax.

Reference parity (train.py:627-639, 884-957; utils.py:129-134):
  * rolling checkpoints with max_to_keep=2 (rm_outdated_ckpt behavior)
  * auto-resume from the newest checkpoint
  * best-FID snapshot saved separately
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from spgan_tpu.train.state import TrainState


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
        payload = self._mgr.restore(
            step, args=ocp.args.StandardRestore({"state": template_state}))
        return payload["state"], {}


def save_best(ckpt_root: str, name: str, state: TrainState):
    path = os.path.join(os.path.abspath(ckpt_root), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
