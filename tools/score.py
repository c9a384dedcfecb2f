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

from tpu_ctc.decode.wer import (bootstrap_ci, format_score_line,  # noqa: E402
                                paired_bootstrap, parse_trn, score_corpus)

# Backwards-compatible re-exports (tests and round-1 scripts import these).
from tpu_ctc.decode.wer import align_counts  # noqa: E402,F401
from tpu_ctc.decode.wer import score_corpus as score  # noqa: E402,F401


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True)
    p.add_argument("--hyp", required=True)
    p.add_argument("--unit", choices=["word", "char"], default="word")
    p.add_argument("--per-utt", action="store_true")
    p.add_argument("--ci", action="store_true",
                   help="bootstrap 95%% CI (2000 utterance resamples)")
    p.add_argument("--hyp2", default=None,
                   help="second system's trn: paired bootstrap of "
                        "WER(hyp) - WER(hyp2) over shared resamples")
    args = p.parse_args(argv)

    refs = parse_trn(args.ref)
    hyps = parse_trn(args.hyp)
    totals, per_utt = score_corpus(refs, hyps, args.unit)
    line = format_score_line(totals, args.unit)
    if args.ci:
        lo, hi = bootstrap_ci(refs, hyps, args.unit)
        line += f"  95% CI [{100*lo:.2f}, {100*hi:.2f}]"
    print(line)
    if args.hyp2:
        hyps2 = parse_trn(args.hyp2)
        t2, _ = score_corpus(refs, hyps2, args.unit)
        l2 = format_score_line(t2, args.unit) + " (hyp2)"
        if args.ci:
            lo, hi = bootstrap_ci(refs, hyps2, args.unit)
            l2 += f"  95% CI [{100*lo:.2f}, {100*hi:.2f}]"
        print(l2)
        d, lo, hi, p = paired_bootstrap(refs, hyps, hyps2, args.unit)
        print(f"paired bootstrap hyp-hyp2: {100*d:+.2f} "
              f"[{100*lo:+.2f}, {100*hi:+.2f}] "
              f"P(hyp2 better)={p:.3f}")
    if args.per_utt:
        for utt, r in sorted(per_utt.items(), key=lambda kv: -kv[1])[:50]:
            print(f"  {utt}\t{100*r:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
