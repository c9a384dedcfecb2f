#!/usr/bin/env python
"""WER/CER scoring harness — in-repo sclite equivalent.

Reference analogue (SURVEY.md C13): the eval2000 scoring path dumped
hypothesis text and shelled out to sclite/Kaldi for WER.  Here scoring is
first-class: trn-style files ("words... (utt_id)" per line) or plain
"utt_id<TAB>text" files are aligned in-repo with per-utterance and corpus
WER/CER plus substitution/insertion/deletion breakdowns.

Usage:
  python tools/score.py --ref ref.trn --hyp hyp.trn [--per-utt]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parse_trn(path: str) -> Dict[str, str]:
    """Parse trn ("text (utt)") or tsv ("utt\ttext") transcript files."""
    out: Dict[str, str] = {}
    for line in open(path):
        line = line.rstrip("\n").strip()
        if not line:
            continue
        m = re.match(r"^(.*)\(([^()]+)\)\s*$", line)
        if m:
            out[m.group(2).strip()] = m.group(1).strip().lower()
        elif "\t" in line:
            utt, text = line.split("\t", 1)
            out[utt.strip()] = text.strip().lower()
        else:
            raise ValueError(f"unparseable line in {path}: {line!r}")
    return out


def align_counts(ref: List[str], hyp: List[str]) -> Tuple[int, int, int]:
    """(substitutions, insertions, deletions) from a Levenshtein alignment."""
    n, m = len(ref), len(hyp)
    d = np.zeros((n + 1, m + 1), np.int64)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]))
    # backtrace
    i, j = n, m
    sub = ins = dele = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] \
                and ref[i - 1] == hyp[j - 1]:
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            sub += 1
            i, j = i - 1, j - 1
        elif j > 0 and d[i, j] == d[i, j - 1] + 1:
            ins += 1
            j -= 1
        else:
            dele += 1
            i -= 1
    return sub, ins, dele


def score(refs: Dict[str, str], hyps: Dict[str, str], unit: str = "word"):
    """Corpus-level scoring; returns a dict of totals and rates."""
    tok = (lambda s: s.split()) if unit == "word" else (lambda s: list(s))
    totals = {"sub": 0, "ins": 0, "del": 0, "ref_tokens": 0, "utts": 0,
              "missing_hyps": 0}
    per_utt = {}
    for utt, ref_text in sorted(refs.items()):
        hyp_text = hyps.get(utt)
        if hyp_text is None:
            totals["missing_hyps"] += 1
            hyp_text = ""
        r, h = tok(ref_text), tok(hyp_text)
        s, i, d = align_counts(r, h)
        totals["sub"] += s
        totals["ins"] += i
        totals["del"] += d
        totals["ref_tokens"] += len(r)
        totals["utts"] += 1
        per_utt[utt] = (s + i + d) / max(len(r), 1)
    errs = totals["sub"] + totals["ins"] + totals["del"]
    totals["error_rate"] = errs / max(totals["ref_tokens"], 1)
    return totals, per_utt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True)
    p.add_argument("--hyp", required=True)
    p.add_argument("--unit", choices=["word", "char"], default="word")
    p.add_argument("--per-utt", action="store_true")
    args = p.parse_args(argv)

    refs = parse_trn(args.ref)
    hyps = parse_trn(args.hyp)
    totals, per_utt = score(refs, hyps, args.unit)
    name = "WER" if args.unit == "word" else "CER"
    print(f"{name} {100*totals['error_rate']:.2f}%  "
          f"[sub {totals['sub']} ins {totals['ins']} del {totals['del']} "
          f"/ {totals['ref_tokens']} {args.unit}s, {totals['utts']} utts, "
          f"{totals['missing_hyps']} missing hyps]")
    if args.per_utt:
        for utt, r in sorted(per_utt.items(), key=lambda kv: -kv[1])[:50]:
            print(f"  {utt}\t{100*r:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
