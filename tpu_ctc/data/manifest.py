"""Manifest-file dataset: features/audio on disk → (feats, labels) pairs.

Replaces the reference's binary feature blobs + keys/sizes manifests
written by the Kaldi pipelines (SURVEY.md C7/C12/C13) with a plain JSONL
manifest; each line:

  {"id": "utt1", "feats": "utt1.npy", "text": "hello world", "frames": 412}
  {"id": "utt2", "audio": "utt2.wav", "text": "...", "samples": 51200}

Paths are relative to the manifest's directory (absolute paths pass
through).  ``feats`` files are ``.npy`` [T, n_mels] float32; ``audio``
files are RIFF-WAV, NIST-SPHERE, or 1-D ``.npy`` waveforms — parsed by
:mod:`tpu_ctc.data.audio_io`, resampled to the config rate, and run
through the in-framework STFT/log-mel frontend.

Two access modes:

  * :class:`ManifestDataset` — **lazy/streaming**: holds only the record
    list (paths + lengths) in RAM; each ``[i]`` access reads and
    processes ONE utterance.  Frame lengths come from manifest metadata
    or container headers, so bucketing never touches audio payloads.
    This is the 300h-scale path (SURVEY.md C7 at configs 3/5): RSS is
    bounded by the working batch, and a multi-host loader only ever
    reads its own shard of the batch plan.
  * :func:`load_manifest_dataset` — eager: materializes everything
    (small corpora, tests).

Frontend processing for lazy access runs on the host CPU backend with
waveforms padded to a small set of quantized lengths, so jit compiles a
handful of shapes instead of one per utterance.
"""
from __future__ import annotations

import functools
import json
import os
from typing import List, Optional, Tuple

import numpy as np

from tpu_ctc.data.alphabet import Alphabet, DEFAULT_ALPHABET
from tpu_ctc.data import audio_io


def _strided_len(n_frames: int, stride: int) -> int:
    """Valid frames after ``[::stride]`` of a prefix-ones mask."""
    return (int(n_frames) + stride - 1) // stride if stride > 1 else int(n_frames)


class ManifestDataset:
    """Lazy Sequence of (feats [T, D] float32, labels [L] int32).

    Only the parsed manifest (id, path, text, length metadata) lives in
    memory; payloads are read per access.  Safe to share across loader
    epochs — no hidden state beyond an optional tiny LRU.
    """

    def __init__(self, manifest_dir: str, cfg,
                 alphabet: Alphabet = DEFAULT_ALPHABET,
                 split: str = "train", cache_items: int = 0):
        self.manifest_dir = manifest_dir
        self.cfg = cfg
        self.alphabet = alphabet
        self.records: List[dict] = []
        path = os.path.join(manifest_dir, f"{split}.jsonl")
        with open(path) as f:
            for line in f:
                if line.strip():
                    self.records.append(json.loads(line))
        self._labels = [
            np.asarray(alphabet.encode(r["text"]), dtype=np.int32)
            for r in self.records
        ]
        self._frame_lengths: Optional[np.ndarray] = None
        self._cache: dict = {}
        self._cache_items = cache_items
        self.payload_reads = 0  # instrumentation for streaming tests

    # -- Sequence protocol ---------------------------------------------------

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return DatasetView(self, range(*i.indices(len(self))))
        if i in self._cache:
            return self._cache[i]
        rec = self.records[i]
        self.payload_reads += 1
        if "feats" in rec:
            feats = self._process_feats(
                np.load(self._abspath(rec["feats"]), mmap_mode="r"))
        elif "audio" in rec:
            wav, _ = audio_io.read_audio(
                self._abspath(rec["audio"]),
                target_rate=self.cfg.frontend.sample_rate)
            feats = self._process_audio(wav, utt_index=i)
        else:
            raise ValueError(f"manifest record needs 'feats' or 'audio': {rec}")
        item = (feats, self._labels[i])
        if self._cache_items:
            if len(self._cache) >= self._cache_items:
                self._cache.pop(next(iter(self._cache)))
            self._cache[i] = item
        return item

    # -- length metadata without payload reads --------------------------------

    @property
    def frame_lengths(self) -> np.ndarray:
        """Model-input frame count per utterance, from metadata/headers only."""
        if self._frame_lengths is None:
            from tpu_ctc.frontend.features import num_frames
            fe = self.cfg.frontend
            out = np.zeros(len(self.records), dtype=np.int64)
            for i, rec in enumerate(self.records):
                if "feats" in rec:
                    t = rec.get("frames")
                    if t is None:
                        t = np.load(self._abspath(rec["feats"]),
                                    mmap_mode="r").shape[0]
                else:
                    n = rec.get("samples")
                    rate = rec.get("rate", 0)
                    if n is not None and rate and rate != fe.sample_rate:
                        from math import gcd
                        g = gcd(int(rate), fe.sample_rate)
                        n = int(np.ceil(n * (fe.sample_rate // g) / (rate // g)))
                    if n is None:
                        n = audio_io.num_samples(self._abspath(rec["audio"]),
                                                 target_rate=fe.sample_rate)
                    t = num_frames(int(n), fe)
                out[i] = _strided_len(t, fe.frame_stride)
            self._frame_lengths = out
        return self._frame_lengths

    # -- per-utterance processing ---------------------------------------------

    def _abspath(self, p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(self.manifest_dir, p)

    def _process_feats(self, feats: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from tpu_ctc.frontend import features as F
        fe = self.cfg.frontend
        x = jnp.asarray(np.asarray(feats, dtype=np.float32))[None]
        with _cpu_default_device():
            if fe.cmvn:
                x = F.cmvn(x)
            x = F.stack_context(x, fe.context)
            if fe.frame_stride > 1:
                x = x[:, ::fe.frame_stride]
            return np.asarray(x[0])

    def _process_audio(self, wav: np.ndarray,
                       utt_index: int = 0) -> np.ndarray:
        import jax.numpy as jnp
        fe = self.cfg.frontend
        # Quantize waveform length so jit sees a bounded shape set
        # (SURVEY.md §7.3-4 "Bucketing × jit" applies to the frontend too).
        quantum = fe.hop_length * 256
        n = len(wav)
        n_pad = max(quantum, ((n + quantum - 1) // quantum) * quantum)
        x = np.zeros(n_pad, dtype=np.float32)
        x[:n] = wav
        with _cpu_default_device():
            # per-utterance dither seed: a fixed key would add the SAME
            # noise pattern to every utterance, defeating dither's
            # decorrelation purpose (ADVICE r3)
            feats, mask = _jit_extract(fe)(
                jnp.asarray(x)[None], jnp.asarray([n], dtype=np.int32),
                jnp.asarray(utt_index, dtype=np.uint32))
            t = int(np.asarray(mask[0]).sum())
            return np.asarray(feats[0, :t])


@functools.lru_cache(maxsize=8)
def _jit_extract(fe_cfg):
    """Jitted frontend (one compile per padded waveform length)."""
    import jax

    from tpu_ctc.frontend import features as F

    def run(x, sl, seed):
        key = (jax.random.PRNGKey(seed)
               if fe_cfg.dither > 0.0 else None)
        return F.extract_features(x, fe_cfg, sample_lengths=sl,
                                  dither_key=key)

    return jax.jit(run)


class DatasetView:
    """Lazy index-remapped view of a ManifestDataset (slices/splits stay
    streaming; no payload reads)."""

    def __init__(self, base, indices):
        self.base = base
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return DatasetView(self.base, [self.indices[j]
                                           for j in range(*i.indices(len(self)))])
        return self.base[self.indices[i]]

    @property
    def frame_lengths(self) -> np.ndarray:
        return np.asarray(self.base.frame_lengths)[self.indices]

    @property
    def records(self):
        return [self.base.records[i] for i in self.indices]


class _cpu_default_device:
    """Context: run eager jnp ops on the host CPU backend (data prep must
    not occupy the accelerator)."""

    def __enter__(self):
        import jax
        self._ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)


def load_manifest_dataset(manifest_dir: str, cfg,
                          alphabet: Alphabet = DEFAULT_ALPHABET,
                          split: str = "train"
                          ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Eagerly load `<manifest_dir>/<split>.jsonl` into in-memory pairs."""
    ds = ManifestDataset(manifest_dir, cfg, alphabet=alphabet, split=split)
    return [ds[i] for i in range(len(ds))]


def write_manifest(manifest_dir: str, split: str, records: List[dict]) -> str:
    os.makedirs(manifest_dir, exist_ok=True)
    path = os.path.join(manifest_dir, f"{split}.jsonl")
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    return path
