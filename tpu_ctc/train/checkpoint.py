"""Orbax checkpointing of the full train state.

Reference: per-epoch ``pickle`` of the parameter list, with no optimizer
state or data-position resume (SURVEY.md §5 "Checkpoint/resume").  Here the
FULL state — params, optax state, step counter, and the data cursor
(epoch, batch index) — is saved with orbax, sharding-aware for multi-host
restore, so a preempted run resumes exactly where it stopped.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from tpu_ctc.train.step import TrainState


def make_manager(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save(manager: ocp.CheckpointManager, state: TrainState,
         epoch: int, batch_cursor: int, force: bool = False) -> None:
    payload = {
        "state": state,
        # 0-d arrays, not numpy scalars: StandardSave rejects np.int32 leaves.
        "cursor": {"epoch": np.asarray(epoch, dtype=np.int32),
                   "batch": np.asarray(batch_cursor, dtype=np.int32)},
    }
    step = int(state.step)
    if step in manager.all_steps():
        return  # identical state already on disk (e.g. resume with no new steps)
    manager.save(step, args=ocp.args.StandardSave(payload), force=force)


def restore(manager: ocp.CheckpointManager, template: TrainState
            ) -> Optional[Tuple[TrainState, int, int]]:
    """Restore the latest checkpoint, or None if the directory is empty.

    ``template`` is an abstract/concrete TrainState with the target
    structure (and shardings, when restoring onto a mesh).
    """
    step = manager.latest_step()
    if step is None:
        return None
    payload = {
        "state": template,
        "cursor": {"epoch": np.asarray(0, dtype=np.int32),
                   "batch": np.asarray(0, dtype=np.int32)},
    }
    restored = manager.restore(step, args=ocp.args.StandardRestore(payload))
    cur = restored["cursor"]
    return restored["state"], int(cur["epoch"]), int(cur["batch"])
