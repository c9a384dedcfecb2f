"""Manifest-file dataset: features/audio on disk → (feats, labels) pairs.

Replaces the reference's binary feature blobs + keys/sizes manifests
written by the Kaldi pipelines (SURVEY.md C7/C12/C13) with a plain JSONL
manifest; each line:

  {"id": "utt1", "feats": "utt1.npy", "text": "hello world"}       # feature mode
  {"id": "utt2", "audio": "utt2.npy", "text": "..."}               # waveform mode

Paths are relative to the manifest's directory.  ``.npy`` feature files are
[T, n_mels] float32; audio files are 1-D float32 waveforms at the config's
sample rate (decoded externally — this framework does not ship codecs).
Waveforms go through the in-framework frontend; precomputed features get
CMVN + context stacking to match (``tools/make_manifest.py`` builds these
layouts for TIMIT/SWBD-style corpora).
"""
from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

from tpu_ctc.data.alphabet import Alphabet, DEFAULT_ALPHABET


def load_manifest_dataset(manifest_dir: str, cfg,
                          alphabet: Alphabet = DEFAULT_ALPHABET,
                          split: str = "train"
                          ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Load `<manifest_dir>/<split>.jsonl` into in-memory (feats, labels)."""
    import jax.numpy as jnp

    from tpu_ctc.frontend import features as F

    path = os.path.join(manifest_dir, f"{split}.jsonl")
    fe = cfg.frontend
    out: List[Tuple[np.ndarray, np.ndarray]] = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            labels = np.asarray(alphabet.encode(rec["text"]), dtype=np.int32)
            if "feats" in rec:
                feats = np.load(os.path.join(manifest_dir, rec["feats"]))
                feats = np.asarray(feats, dtype=np.float32)
                x = jnp.asarray(feats)[None]
                if fe.cmvn:
                    x = F.cmvn(x)
                x = F.stack_context(x, fe.context)
                if fe.frame_stride > 1:
                    x = x[:, ::fe.frame_stride]
                feats = np.asarray(x[0])
            elif "audio" in rec:
                wav = np.load(os.path.join(manifest_dir, rec["audio"]))
                wav = np.asarray(wav, dtype=np.float32)
                feats, _ = F.extract_features(
                    jnp.asarray(wav)[None], fe,
                    jnp.asarray([len(wav)], dtype=jnp.int32))
                feats = np.asarray(feats[0])
            else:
                raise ValueError(f"manifest record needs 'feats' or 'audio': {rec}")
            out.append((feats, labels))
    return out


def write_manifest(manifest_dir: str, split: str, records: List[dict]) -> str:
    os.makedirs(manifest_dir, exist_ok=True)
    path = os.path.join(manifest_dir, f"{split}.jsonl")
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    return path
