"""Checkpointing (orbax) — the TPU counterpart of the reference's
``torch.save``/``--resume`` protocol.

The reference saves a dict of {config dicts, model state_dict, optimizer,
scheduler, best metric, epoch} as ``best.pth`` + periodic
``model_epoch_N.pth`` (``train_dfaust_rot.py:411-432,640-683``).  Here the
same logical payload — TrainState (params, batch_stats, calib, opt_state,
step) + config dicts + epoch/best metric — goes through orbax, with
``best`` and ``latest`` roles encoded in the step id.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin orbax wrapper storing (state, metadata) per step."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metadata: Optional[Dict] = None):
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        self._mgr.save(step, args=args)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        """Sorted list of stored checkpoint steps (for ensembling)."""
        return sorted(self._mgr.all_steps())

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore (state, metadata); ``state_template`` provides the pytree
        structure/shapes (an abstract or freshly-initialised TrainState)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored.get("metadata")

    def close(self):
        self._mgr.close()
