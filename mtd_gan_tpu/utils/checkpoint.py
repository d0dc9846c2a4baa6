"""Checkpoint / resume via orbax.

Parity target: reference per-epoch full-state .pth checkpoints
(train.py:276-310: model + both optimizers + both schedulers + epoch + args)
and resume (train.py:146-173). Improvements over the reference (documented):
  * MTO method state IS checkpointed (reference quirk #5: method disabled on
    resume and its state never saved, train.py:117).
  * async-capable orbax backend, atomic directory commits, keep-last-k.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=False
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state: Any, extra: Optional[Dict] = None):
        """state: any pytree (train state incl. optimizers, MTO state, rng)."""
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"extra": ocp.args.JsonSave(extra)}
                if extra is not None
                else {}
            ),
        )
        self._mgr.save(epoch, args=args)
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, epoch: Optional[int] = None):
        """Restore into the structure of `state_template` (shapes/dtypes and
        shardings inferred from the template)."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template)),
        )
        return step, restored["state"]

    def close(self):
        self._mgr.close()
