"""Greedy (best-path) CTC decoding, fully on-device with static shapes.

Reference: argmax per frame → collapse repeats → strip blanks
(SURVEY.md C8 ``decode_best_path``), used for cheap CER during training.
Here it is batched and jit-compiled: the collapse/compaction is done with a
cumsum + one-hot matmul scatter, so the output is a fixed-shape
``[B, T]`` id buffer plus lengths — no host round trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def collapse_ids(ids: jnp.ndarray, frame_mask: jnp.ndarray, blank: int = 0):
    """Collapse repeats and strip blanks from per-frame ids.

    Args:
      ids: [B, T] int32 per-frame argmax ids.
      frame_mask: [B, T] 1.0 for valid frames.
      blank: blank id.

    Returns:
      (out [B, T] int32 zero-padded decoded sequences, lengths [B] int32).
    """
    b, t = ids.shape
    valid = frame_mask > 0
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=blank)[:, :t]
    # First valid frame has no predecessor.
    first = jnp.cumsum(valid.astype(jnp.int32), axis=1) == 1
    keep = valid & (ids != blank) & ((ids != prev) | first)
    # Target position of each kept id, then scatter via one-hot matmul
    # (static-shape, MXU/VPU-friendly; avoids per-row dynamic scatters).
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, t)                       # parked at t (dropped)
    onehot = (pos[:, :, None] == jnp.arange(t)[None, None, :])
    out = jnp.einsum("btj,bt->bj", onehot.astype(jnp.int32), ids)
    lengths = jnp.sum(keep.astype(jnp.int32), axis=1)
    return out, lengths


@jax.jit
def greedy_decode(log_probs: jnp.ndarray, frame_mask: jnp.ndarray,
                  blank: int = 0):
    """[B, T, A] log-posteriors → (decoded ids [B, T], lengths [B])."""
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    return collapse_ids(ids, frame_mask, blank)
