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


def export_npz(path: str, params) -> int:
    """Flat-key .npz export of a param pytree (the reference's
    ``writeNumpyWeights`` role, SURVEY.md C14: portable weight snapshots
    for decode-only consumers and interop, without orbax).  Keys are
    '/'-joined tree paths; returns the number of arrays written."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)
    return len(flat)


def import_npz(path: str, template):
    """Load an :func:`export_npz` file back into ``template``'s tree
    structure (shapes/dtypes validated leaf by leaf)."""
    data = np.load(path)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in paths:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        if key not in data:
            raise KeyError(f"missing weight {key!r} in {path}")
        arr = data[key]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch for {key!r}: file "
                             f"{arr.shape} vs template {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
