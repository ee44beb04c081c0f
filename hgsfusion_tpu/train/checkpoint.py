"""Checkpointing: orbax save/restore + auto-resume.

Reference: tools/train_utils/train_utils.py:197-254 (torch pickle ckpts,
max-keep pruning, periodic 'latest') and tools/train.py:146-158 (auto-resume
from the newest loadable checkpoint). Orbax gives atomic, async-capable,
sharding-aware checkpoints instead of CPU-tensor pickles.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, ckpt_dir, max_to_keep: int = 30):
        self.ckpt_dir = Path(ckpt_dir).absolute()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state, wait: bool = False):
        # idempotent on step: orbax raises StepAlreadyExistsError on a
        # duplicate, and the end-of-training flush routinely lands on the
        # step the epoch-boundary save just wrote (tools/train.py)
        if step in self.manager.all_steps():
            # visible, not silent: a caller saving genuinely NEW state at an
            # already-saved step keeps the older state (ADVICE r2)
            logger.info(
                "checkpoint step %d already exists in %s — skipping save "
                "(existing state kept)", step, self.ckpt_dir)
            if wait:
                self.manager.wait_until_finished()
            return
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure of `state_template` (auto-resume when
        step is None; returns None if no checkpoint exists)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step
