#!/usr/bin/env python
"""WER/CER scoring harness — in-repo sclite equivalent (CLI wrapper).

Reference analogue (SURVEY.md C13): the eval2000 scoring path dumped
hypothesis text and shelled out to sclite/Kaldi for WER.  Here scoring is
first-class in :mod:`tpu_ctc.decode.wer`: trn-style files
("words... (utt_id)" per line) or plain "utt_id<TAB>text" files are
aligned with per-utterance and corpus WER/CER plus sub/ins/del
breakdowns.  The same code path runs inside ``python -m tpu_ctc.cli
score`` and the decode eval job.

Usage:
  python tools/score.py --ref ref.trn --hyp hyp.trn [--unit char] [--per-utt]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_ctc.decode.wer import (format_score_line, parse_trn,  # noqa: E402
                                score_corpus)

# Backwards-compatible re-exports (tests and round-1 scripts import these).
from tpu_ctc.decode.wer import align_counts  # noqa: E402,F401
from tpu_ctc.decode.wer import score_corpus as score  # noqa: E402,F401


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True)
    p.add_argument("--hyp", required=True)
    p.add_argument("--unit", choices=["word", "char"], default="word")
    p.add_argument("--per-utt", action="store_true")
    args = p.parse_args(argv)

    refs = parse_trn(args.ref)
    hyps = parse_trn(args.hyp)
    totals, per_utt = score_corpus(refs, hyps, args.unit)
    print(format_score_line(totals, args.unit))
    if args.per_utt:
        for utt, r in sorted(per_utt.items(), key=lambda kv: -kv[1])[:50]:
            print(f"  {utt}\t{100*r:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
