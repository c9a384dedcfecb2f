"""Bucketed-by-length batching with static padded shapes.

The reference streamed one utterance at a time from pickled "file dicts"
(SURVEY.md C7) — fine for a single GPU, hostile to XLA.  Here utterances are
bucketed by frame count into a small, fixed set of padded shapes
(BASELINE north_star: "utterance batches are data-parallel over hosts with
bucketed-by-length padding"), so jit compiles once per bucket shape
(SURVEY.md §7.3-4 "Bucketing × jit") and every batch is a static-shape
pytree ready for `device_put` with a 'data'-axis sharding.

Determinism/resume: the shuffle is a pure function of (seed, epoch), and the
iterator exposes a cursor that the checkpoint can record (SURVEY.md §7.3-5).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tpu_ctc.config import DataConfig


@dataclasses.dataclass
class Batch:
    """Static-shape training batch (numpy host-side; device_put by the loop)."""
    feats: np.ndarray          # [B, T_pad, D] float32
    frame_mask: np.ndarray     # [B, T_pad] float32
    frame_lengths: np.ndarray  # [B] int32
    labels: np.ndarray         # [B, L_pad] int32 (zero-padded)
    label_lengths: np.ndarray  # [B] int32
    # Number of genuine utterances (< B when the tail batch is padded with
    # repeats; repeated rows have weight 0).
    weights: np.ndarray        # [B] float32
    # Dataset index per row (repeated-tail rows keep the repeated index but
    # carry weight 0); -1 when the batch was built without indices.  Host
    # metadata only — never shipped to device.  Lets eval jobs map hyps
    # back to utterance ids for trn emission (SURVEY.md C13 scoring).
    utt_indices: np.ndarray = None  # [B] int64

    @property
    def shape_key(self) -> Tuple[int, int, int]:
        return (self.feats.shape[0], self.feats.shape[1], self.labels.shape[1])

    def audio_seconds(self, frames_per_second: float = 100.0) -> float:
        return float((self.frame_lengths * self.weights).sum() / frames_per_second)


def _bucket_for(t: int, boundaries: Sequence[int]) -> Optional[int]:
    for i, b in enumerate(boundaries):
        if t <= b:
            return i
    return None  # longer than the largest bucket: dropped (logged by caller)


def _label_pad_for(bucket_frames: int, max_label_len: int) -> int:
    # Labels padded to a per-bucket cap: no more labels than frames can emit.
    return int(min(max_label_len, bucket_frames))


def make_batch(utts: List[Tuple[np.ndarray, np.ndarray]],
               t_pad: int, l_pad: int, batch_size: int,
               indices: Optional[Sequence[int]] = None) -> Batch:
    """Pad a list of (feats [T,D], labels [L]) to one static-shape Batch."""
    n = len(utts)
    assert 0 < n <= batch_size
    d = utts[0][0].shape[1]
    feats = np.zeros((batch_size, t_pad, d), dtype=np.float32)
    mask = np.zeros((batch_size, t_pad), dtype=np.float32)
    f_len = np.zeros(batch_size, dtype=np.int32)
    labels = np.zeros((batch_size, l_pad), dtype=np.int32)
    l_len = np.zeros(batch_size, dtype=np.int32)
    weights = np.zeros(batch_size, dtype=np.float32)
    for i in range(batch_size):
        f, l = utts[i % n]           # tail batches repeat, weight 0
        t, ll = len(f), len(l)
        feats[i, :t] = f
        mask[i, :t] = 1.0
        f_len[i] = t
        labels[i, :ll] = l
        l_len[i] = ll
        weights[i] = 1.0 if i < n else 0.0
    if indices is None:
        utt_idx = np.full(batch_size, -1, dtype=np.int64)
    else:
        utt_idx = np.asarray([indices[i % n] for i in range(batch_size)],
                             dtype=np.int64)
    return Batch(feats, mask, f_len, labels, l_len, weights, utt_idx)


class BucketedLoader:
    """Epoch iterator over bucketed static-shape batches.

    ``dataset`` is a sequence of (feats [T, D] float32, labels [L] int32).
    For multi-host data parallelism pass (host_id, num_hosts): each host
    deterministically takes a disjoint strided shard of every epoch's
    shuffled order (SURVEY.md §2.2 P1 "per-host input sharding").
    """

    def __init__(self, dataset: Sequence[Tuple[np.ndarray, np.ndarray]],
                 cfg: DataConfig, host_id: int = 0, num_hosts: int = 1):
        self.cfg = cfg
        self.host_id = host_id
        self.num_hosts = num_hosts
        # Lazy datasets (ManifestDataset) are kept as-is: list() would read
        # every payload, defeating the streaming path.  Anything indexable
        # passes through; generators are materialized.
        self.dataset = dataset if hasattr(dataset, "__getitem__") else list(dataset)
        self.num_dropped = 0
        self._bucket_items: List[List[int]] = [[] for _ in cfg.bucket_boundaries]
        if hasattr(self.dataset, "frame_lengths"):
            # Metadata-only lengths: bucket a 300h corpus without touching
            # audio payloads (SURVEY.md C7 at configs 3/5).
            self._lengths = np.asarray(self.dataset.frame_lengths)
        else:
            self._lengths = np.array([len(f) for f, _ in self.dataset])
        for i, t in enumerate(self._lengths):
            b = _bucket_for(int(t), cfg.bucket_boundaries)
            if b is None:
                self.num_dropped += 1
            else:
                self._bucket_items[b].append(i)

    def _epoch_order(self, epoch: int) -> List[Tuple[int, List[int]]]:
        """Deterministic (bucket, utterance-ids) batch plan for an epoch."""
        cfg = self.cfg
        plan: List[Tuple[int, List[int]]] = []
        rng = np.random.RandomState((cfg.seed * 1000003 + epoch) % (2**31))
        for b, items in enumerate(self._bucket_items):
            items = list(items)
            if cfg.sortagrad and epoch == 0:
                items.sort(key=lambda i: int(self._lengths[i]))
            elif cfg.shuffle:
                rng.shuffle(items)
            for s in range(0, len(items), cfg.batch_size):
                plan.append((b, items[s:s + cfg.batch_size]))
        if cfg.shuffle and not (cfg.sortagrad and epoch == 0):
            order = rng.permutation(len(plan))
            plan = [plan[i] for i in order]
        # Multi-host: strided disjoint shard of the batch plan.
        return plan[self.host_id::self.num_hosts]

    def num_batches(self, epoch: int = 0) -> int:
        return len(self._epoch_order(epoch))

    def epoch(self, epoch: int, start_batch: int = 0) -> Iterator[Tuple[int, Batch]]:
        """Yield (cursor, Batch); ``start_batch`` resumes mid-epoch."""
        cfg = self.cfg
        plan = self._epoch_order(epoch)
        for cursor in range(start_batch, len(plan)):
            b, ids = plan[cursor]
            t_pad = cfg.bucket_boundaries[b]
            l_pad = _label_pad_for(t_pad, cfg.max_label_len)
            utts = [self.dataset[i] for i in ids]
            yield cursor, make_batch(utts, t_pad, l_pad, cfg.batch_size,
                                     indices=ids)

    def shape_keys(self) -> List[Tuple[int, int, int]]:
        """All (B, T_pad, L_pad) shapes jit will ever see (compile-cache bound)."""
        cfg = self.cfg
        return [(cfg.batch_size, t, _label_pad_for(t, cfg.max_label_len))
                for t in cfg.bucket_boundaries]
