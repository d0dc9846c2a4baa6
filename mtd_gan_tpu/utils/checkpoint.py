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
        shardings inferred from the template).

        Falls back to a PARTIAL restore when the template's structure is a
        strict subset of the checkpoint's — the reference's test.py loads
        only model_state_dict from full train checkpoints (test.py:100-104),
        so our test.py (whose eval trainer carries no MTO state) must be
        able to read train-time checkpoints that saved one. Template leaves
        missing on disk still raise."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        try:
            restored = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(state_template)),
            )
            return step, restored["state"]
        except ValueError as e:
            if "do not match" not in str(e):
                raise
            mismatch_err = e
        # The template carries EMPTY train-only subtrees (an eval trainer's
        # mto_state=None / mto_opt=EmptyState) where the checkpoint saved
        # real state. Synthesize those subtrees from the checkpoint's own
        # metadata (ShapeDtypeStruct leaves), restore the merged template,
        # then drop the train-only values again — the reference's test.py
        # reads only model_state_dict out of full train checkpoints the
        # same way (test.py:100-104).
        import dataclasses

        from etils import epath

        if not (dataclasses.is_dataclass(state_template)
                and hasattr(state_template, "replace")):
            raise mismatch_err  # non-dataclass states: nothing smarter to do
        meta = ocp.StandardCheckpointHandler().metadata(
            epath.Path(os.path.join(self.directory, str(step), "state")))
        subs, drop = {}, {}
        for f in dataclasses.fields(state_template):
            tsub = getattr(state_template, f.name)
            # meta is orbax's mapping-like TreeMetadata (not a plain dict)
            msub = meta.get(f.name) if hasattr(meta, "get") else None
            t_leaves = jax.tree_util.tree_leaves(tsub)
            m_leaves = jax.tree_util.tree_leaves(msub)
            if not t_leaves and m_leaves:
                subs[f.name] = jax.tree_util.tree_map(
                    lambda am: jax.ShapeDtypeStruct(
                        tuple(am.shape), am.dtype), msub)
                drop[f.name] = tsub
        if not subs:
            raise mismatch_err  # not the known empty-subtree case
        merged = state_template.replace(**subs)
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(merged)),
        )
        return step, restored["state"].replace(**drop)

    def close(self):
        self._mgr.close()
