"""Character language models for lexicon-free decoding.

Reference (SURVEY.md C10): char n-gram LMs trained with an external toolkit
and loaded as lookups, plus a neural char LM (NAACL'15), scored per prefix
inside the Cython beam search.  TPU-native re-design: the n-gram LM is a
**dense log-probability table** resident on device — scoring a beam of
prefixes is a pure gather, fusable into the decode step.  For char
alphabets (A ~ 30) a full trigram table is A^3 * 4 bytes ~ 100 KB: tiny.

Training is in-repo (no external toolkit): interpolated additive-smoothed
relative frequencies from label sequences.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

# Context id 0 is the BOS/blank context: positions before the prefix start.
BOS = 0


@dataclasses.dataclass
class NGramCharLM:
    """Dense char n-gram LM with interpolated lower orders.

    ``logp`` has shape [A]*order: logp[c_{-order+1}, ..., c_{-1}, c].
    Index 0 in a context slot means "before start of sequence" (BOS); the
    tables are trained with that convention, so scoring needs no special
    casing — pad missing history with 0.
    """

    order: int
    vocab_size: int
    logp: np.ndarray  # [A]*order float32

    def score_host(self, history: Sequence[int], c: int) -> float:
        """Host-side single-prefix scoring (for the reference decoder)."""
        h = list(history)[-(self.order - 1):] if self.order > 1 else []
        h = [BOS] * (self.order - 1 - len(h)) + h
        return float(self.logp[tuple(h) + (c,)])

    def tables_device(self):
        import jax.numpy as jnp
        return jnp.asarray(self.logp)


def train_ngram_lm(label_seqs: List[np.ndarray], vocab_size: int,
                   order: int = 3, add_k: float = 0.25,
                   interpolation: Optional[Tuple[float, ...]] = None
                   ) -> NGramCharLM:
    """Interpolated additive-smoothed n-gram LM from label id sequences.

    Character ids are 1..A-1 (0 is blank/BOS — never emitted), matching the
    CTC alphabet convention.
    """
    if order < 1:
        raise ValueError("order must be >= 1")
    a = vocab_size
    # Raw counts for every order 1..order.
    counts = [np.zeros((a,) * o, dtype=np.float64) for o in range(1, order + 1)]
    for seq in label_seqs:
        seq = list(np.asarray(seq, dtype=np.int64))
        for i, c in enumerate(seq):
            for o in range(1, order + 1):
                h = seq[max(0, i - o + 1): i]
                h = [BOS] * (o - 1 - len(h)) + h
                counts[o - 1][tuple(h) + (c,)] += 1.0

    # Per-order smoothed conditional probabilities.
    probs = []
    for o in range(1, order + 1):
        cnt = counts[o - 1] + add_k
        cnt[..., BOS] = 0.0            # blank/BOS is never predicted
        denom = cnt.sum(axis=-1, keepdims=True)
        denom = np.where(denom <= 0, 1.0, denom)
        probs.append(cnt / denom)

    if interpolation is None:
        w = np.array([2.0 ** i for i in range(order)], dtype=np.float64)
        interpolation = tuple(w / w.sum())
    mix = np.zeros((a,) * order, dtype=np.float64)
    for o, (p, lam) in enumerate(zip(probs, interpolation), start=1):
        # broadcast lower orders over the extra (older) context dims
        expand = p.reshape((1,) * (order - o) + p.shape)
        mix = mix + lam * expand
    logp = np.log(np.maximum(mix, 1e-30)).astype(np.float32)
    return NGramCharLM(order=order, vocab_size=a, logp=logp)


def label_seqs_of(dataset) -> List[np.ndarray]:
    """Transcript label sequences of a dataset, without payload reads."""
    if hasattr(dataset, "_labels"):      # lazy ManifestDataset: labels are
        return list(dataset._labels)     # already decoded — no payload reads
    if hasattr(dataset, "base"):         # DatasetView over a lazy dataset
        return [dataset.base._labels[i] for i in dataset.indices]
    return [labels for _, labels in dataset]


def train_char_lm_from_data(dataset, cfg) -> Optional[NGramCharLM]:
    """Convenience: train the decode-config LM from (feats, labels) pairs."""
    if cfg.decode.lm_order <= 0:
        return None
    return train_ngram_lm(label_seqs_of(dataset), cfg.model.vocab_size,
                          order=cfg.decode.lm_order)


def lm_perplexity(lm: NGramCharLM, label_seqs: List[np.ndarray]) -> float:
    total, n = 0.0, 0
    for seq in label_seqs:
        hist: List[int] = []
        for c in np.asarray(seq, dtype=np.int64):
            total += lm.score_host(hist, int(c))
            hist.append(int(c))
            n += 1
    return float(np.exp(-total / max(n, 1)))
