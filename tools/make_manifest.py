#!/usr/bin/env python
"""Corpus manifest builder — the TIMIT/SWBD prep pipeline, in-framework.

Reference analogue (SURVEY.md C12/C13): Kaldi shell pipelines in
``timit-utils/`` / ``swbd-utils/`` producing binary feature blobs + key
manifests.  Here corpora are described by a JSONL manifest consumed by
:mod:`tpu_ctc.data.manifest`; features come from the in-framework
STFT/log-mel frontend (waveform mode) or from precomputed ``.npy``
matrices (feature mode).

Supported layouts:

  * ``--layout dir``   — a directory of ``<utt>.npy`` (1-D waveform or
    [T, D] features; detected by ndim) with ``<utt>.txt`` transcripts
    alongside.
  * ``--layout tsv``    — a TSV file: ``utt_id<TAB>path<TAB>transcript``.
  * ``--layout timit``  — TIMIT-style tree: ``*.WAV.npy`` converted audio
    next to ``*.TXT`` prompts (start/end sample numbers stripped).

Usage:
  python tools/make_manifest.py --layout dir --src /data/utts \
      --out manifests/train --split train [--val-frac 0.05]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_ctc.data.alphabet import DEFAULT_ALPHABET  # noqa: E402
from tpu_ctc.data.manifest import write_manifest  # noqa: E402


def normalize_text(text: str) -> str:
    """Lexicon-free char normalization: lowercase letters, space,
    apostrophe; everything else dropped (the papers' character set)."""
    text = text.lower()
    text = re.sub(r"[^a-z' ]+", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def records_from_dir(src: str):
    for npy in sorted(glob.glob(os.path.join(src, "*.npy"))):
        utt = os.path.splitext(os.path.basename(npy))[0]
        txt = os.path.join(src, utt + ".txt")
        if not os.path.exists(txt):
            continue
        text = normalize_text(open(txt).read())
        if not text:
            continue
        import numpy as np
        arr = np.load(npy, mmap_mode="r")
        key = "audio" if arr.ndim == 1 else "feats"
        yield {"id": utt, key: os.path.relpath(npy, src), "text": text}


def records_from_tsv(src: str):
    base = os.path.dirname(os.path.abspath(src))
    for line in open(src):
        parts = line.rstrip("\n").split("\t")
        if len(parts) != 3:
            continue
        utt, path, text = parts
        text = normalize_text(text)
        if not text:
            continue
        import numpy as np
        full = path if os.path.isabs(path) else os.path.join(base, path)
        arr = np.load(full, mmap_mode="r")
        key = "audio" if arr.ndim == 1 else "feats"
        yield {"id": utt, key: full, "text": text}


def records_from_timit(src: str):
    for npy in sorted(glob.glob(os.path.join(src, "**", "*.WAV.npy"),
                                recursive=True)):
        txt = npy.replace(".WAV.npy", ".TXT")
        if not os.path.exists(txt):
            continue
        raw = open(txt).read().split(None, 2)
        text = normalize_text(raw[2] if len(raw) >= 3 else "")
        if not text:
            continue
        utt = os.path.relpath(npy, src).replace(os.sep, "_")\
            .replace(".WAV.npy", "").lower()
        yield {"id": utt, "audio": os.path.relpath(npy, src), "text": text}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--layout", choices=["dir", "tsv", "timit"], required=True)
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True, help="manifest output directory")
    p.add_argument("--split", default="train")
    p.add_argument("--val-frac", type=float, default=0.0,
                   help="carve off a validation split deterministically")
    p.add_argument("--alphabet-out", default=None)
    args = p.parse_args(argv)

    gen = {"dir": records_from_dir, "tsv": records_from_tsv,
           "timit": records_from_timit}[args.layout]
    records = list(gen(args.src))
    if not records:
        print("no records found", file=sys.stderr)
        return 1
    # deterministic split by utterance-id hash
    if args.val_frac > 0:
        import hashlib
        val, train = [], []
        for r in records:
            h = int(hashlib.md5(r["id"].encode()).hexdigest()[:8], 16)
            (val if (h % 10000) < args.val_frac * 10000 else train).append(r)
        write_manifest(args.out, args.split, train)
        write_manifest(args.out, "valid", val)
        print(f"wrote {len(train)} train / {len(val)} valid records")
    else:
        write_manifest(args.out, args.split, records)
        print(f"wrote {len(records)} {args.split} records")
    if args.alphabet_out:
        DEFAULT_ALPHABET.save(args.alphabet_out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
