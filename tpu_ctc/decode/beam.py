"""CTC prefix beam search with character-LM fusion.

Reference (SURVEY.md C9, §3.3): per-utterance Cython beam search on CPU —
a dict of prefixes, each holding (p_blank, p_non-blank), extended per frame,
scored with alpha*logP_LM(c|prefix) + beta, pruned to a beam.

Two implementations here:

  * :func:`prefix_beam_search_host` — the dict-based host algorithm, kept
    as a readable reference and the parity oracle for the device decoder
    (the role the reference's pure-python decoder played for its Cython
    ports).  A C++ port lives in ``cpp/`` (same algorithm, compiled),
    mirroring where the reference was native.

  * :func:`prefix_beam_search` — the TPU-native design (BASELINE:
    "batched on-device collective decode"): **fixed-shape** beam tensors,
    vmapped over the batch, scanned over time.  The dynamic prefix set
    becomes a static [K, L] buffer; duplicate prefixes produced by
    different extensions are merged **exactly** via a double 32-bit
    rolling-hash sort + segmented log-sum-exp (no host dicts, no dynamic
    shapes; collision probability ~ (K*A)^2 / 2^64 per frame — negligible).
    Everything stays on device; the only host crossing is reading the
    final hypothesis ids.

The no-pruning fixed-shape design means the device decoder is *exact*
prefix beam search (same math as the host version) — the reference's
probability-threshold pruning only mattered for CPU speed.
"""
from __future__ import annotations

import functools
import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ctc.decode.lm import NGramCharLM

NEG_INF = -1e30

# Rolling-hash multipliers (odd => invertible mod 2^32, good mixing).
_H1_MULT = np.uint32(2654435761)
_H2_MULT = np.uint32(40503)
# Modular inverses: h_parent = (h - c) * M^-1 recovers the prefix-minus-
# last-char hash, which is what makes the sort-free duplicate merge work.
_H1_INV = np.uint32(244002641)
_H2_INV = np.uint32(1650947975)
_H1_EMPTY = np.uint32(0x9E3779B9)
_H2_EMPTY = np.uint32(0x85EBCA6B)


def _lse2(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + 1e-37)
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


# ---------------------------------------------------------------------------
# Host reference implementation
# ---------------------------------------------------------------------------

def _np_lse(*xs):
    m = max(xs)
    if m <= NEG_INF / 2:
        return NEG_INF
    return m + math.log(sum(math.exp(x - m) for x in xs))


def prefix_beam_search_host(log_probs: np.ndarray,
                            length: Optional[int] = None,
                            beam_width: int = 64,
                            blank: int = 0,
                            lm: Optional[NGramCharLM] = None,
                            lm_alpha: float = 1.0,
                            lm_beta: float = 0.0) -> Tuple[List[int], float]:
    """Exact dict-based prefix beam search for ONE utterance.

    log_probs: [T, A] normalized log posteriors.  Returns (best prefix ids,
    its log score).
    """
    log_probs = np.asarray(log_probs, dtype=np.float64)
    t_total, a = log_probs.shape
    if length is None:
        length = t_total
    # prefix -> [p_blank, p_non_blank]
    beams: Dict[Tuple[int, ...], List[float]] = {(): [0.0, NEG_INF]}
    for t in range(length):
        lp = log_probs[t]
        new: Dict[Tuple[int, ...], List[float]] = defaultdict(
            lambda: [NEG_INF, NEG_INF])
        for prefix, (pb, pnb) in beams.items():
            total = _np_lse(pb, pnb)
            # stay: emit blank
            ent = new[prefix]
            ent[0] = _np_lse(ent[0], total + lp[blank])
            # stay: repeat last char without an intervening blank
            if prefix:
                ent[1] = _np_lse(ent[1], pnb + lp[prefix[-1]])
            # extend with every non-blank char
            for c in range(a):
                if c == blank:
                    continue
                contrib = (pb if (prefix and c == prefix[-1]) else total) + lp[c]
                if lm is not None:
                    contrib += lm_alpha * lm.score_host(prefix, c) + lm_beta
                ext = new[prefix + (c,)]
                ext[1] = _np_lse(ext[1], contrib)
        items = sorted(new.items(), key=lambda kv: -_np_lse(*kv[1]))
        beams = dict(items[:beam_width])
    best, (pb, pnb) = max(beams.items(), key=lambda kv: _np_lse(*kv[1]))
    return list(best), _np_lse(pb, pnb)


# ---------------------------------------------------------------------------
# Batched on-device implementation
# ---------------------------------------------------------------------------

def _lm_scores(lm_table: jnp.ndarray, order: int, last: jnp.ndarray,
               last2: jnp.ndarray) -> jnp.ndarray:
    """Per-beam LM row: [K, A] log P(c | context).  Context slot 0 = BOS."""
    if order == 1:
        k = last.shape[0]
        return jnp.broadcast_to(lm_table[None, :], (k, lm_table.shape[0]))
    if order == 2:
        return lm_table[last]
    if order == 3:
        return lm_table[last2, last]
    raise ValueError(f"device decoder supports LM order<=3, got {order}")


def _beam_search_single(log_probs, frame_len, *, beam_width, max_len, blank,
                        lm_table, lm_order, lm_alpha, lm_beta,
                        nlm_params=None, char_topk=0, prune_logp=None,
                        unroll=8, return_beams=False):
    """Beam search for one utterance; vmapped over the batch by the caller.

    Duplicate-prefix merging is SORT-FREE: the only possible collision is
    an extension candidate (prefix_k + c) against the *stay* candidate of
    a beam j whose string equals it (extensions are pairwise distinct —
    p+c == q+c' with equal lengths forces (p,c)==(q,c') — and beam
    prefixes are pairwise distinct by invariant).  Because the rolling
    hash is invertible ((h - c) * M^-1 recovers the parent's hash), each
    beam j finds its "mate" k with prefix_k == prefix_j[:-1] by a K x K
    hash match; the (k, last_j) extension's mass is folded into j's stay
    candidate and masked out of the grid.  All surviving candidates then
    carry distinct strings, so one top-k replaces the round-1 design's
    [K*A] two-key six-payload sort + top-k (the decode bottleneck,
    VERDICT r1 item 4).

    ``char_topk`` (static) keeps only the top-C non-blank chars of each
    frame as extension columns — the candidate grid shrinks from [K, A]
    to [K, C].  0 = exact (all chars).  ``prune_logp`` additionally masks
    extension chars whose acoustic log-prob is below the threshold (the
    reference decoder's probability pruning, SURVEY C9; round 1 carried
    the config field without a consumer).
    """
    from tpu_ctc.decode import neural_lm

    t_total, a = log_probs.shape
    k = beam_width
    c_cols = a - 1 if not char_topk else min(char_topk, a - 1)

    beam_ids = jnp.arange(k, dtype=jnp.uint32)
    init = {
        "buf": jnp.zeros((k, max_len), jnp.int32),
        "plen": jnp.zeros((k,), jnp.int32),
        "last": jnp.zeros((k,), jnp.int32),
        "last2": jnp.zeros((k,), jnp.int32),
        # beam 0 = empty prefix; others dead with unique hashes
        "h1": jnp.where(beam_ids == 0, _H1_EMPTY, beam_ids + 1),
        "h2": jnp.where(beam_ids == 0, _H2_EMPTY, beam_ids + 1),
        "pb": jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF),
        "pnb": jnp.full((k,), NEG_INF),
    }
    if nlm_params is not None:
        # per-beam GRU state over the prefix (neural char LM, SURVEY C10)
        init["hlm"] = neural_lm.init_state(nlm_params, (k,))

    chars = jnp.arange(a, dtype=jnp.int32)

    def step(state, inputs):
        lp, t_i = inputs                                       # lp: [A]
        pb, pnb = state["pb"], state["pnb"]
        last, plen = state["last"], state["plen"]
        total = _lse2(pb, pnb)                                 # [K]

        # ---- frame-level char preselection ---------------------------
        lp_ext = jnp.where(chars == blank, NEG_INF, lp)
        if c_cols < a - 1:
            lp_sel, chars_sel = jax.lax.top_k(lp_ext, c_cols)  # [C]
            sel_thresh = lp_sel[-1]          # C-th largest: admission bar
        else:
            # exact path: all non-blank chars, in a static order
            chars_sel = jnp.where(chars < blank, chars, chars + 1)[:a - 1]
            lp_sel = lp_ext[chars_sel]
            sel_thresh = jnp.float32(2 * NEG_INF)
        if prune_logp is not None:
            lp_sel = jnp.where(lp_sel < prune_logp, NEG_INF, lp_sel)

        # ---- per-beam LM rows (dense gathers) -------------------------
        def lm_rows(last_ids, last2_ids, hlm):
            """Combined n-gram + neural LM scores [K, A] for a context."""
            row = None
            if lm_table is not None:
                row = lm_alpha * _lm_scores(lm_table, lm_order,
                                            last_ids, last2_ids) + lm_beta
            if nlm_params is not None:
                nrow = lm_alpha * neural_lm.log_probs(nlm_params, hlm) \
                    + lm_beta
                row = nrow if row is None else row + nrow
            return row

        hlm = state.get("hlm")
        lm_row = lm_rows(last, state["last2"], hlm)             # [K, A]|None
        lm_sel = lm_row[:, chars_sel] if lm_row is not None else None

        # ---- mate detection (sort-free duplicate merge) ---------------
        last_u = last.astype(jnp.uint32)
        ph1 = (state["h1"] - last_u) * _H1_INV                  # [K]
        ph2 = (state["h2"] - last_u) * _H2_INV
        has_parent = (plen > 0) & (total > NEG_INF / 2)
        match = (ph1[:, None] == state["h1"][None, :]) \
            & (ph2[:, None] == state["h2"][None, :]) \
            & has_parent[:, None]                               # [j, k]
        mate = jnp.argmax(match, axis=1)                        # [K]
        has_mate = jnp.any(match, axis=1)

        # ---- stay candidates (one per beam, same prefix) ---------------
        stay_pb = total + lp[blank]
        stay_pnb = jnp.where(plen > 0, pnb + lp[last], NEG_INF)
        # fold the mate's extension (prefix_mate + last_j == prefix_j) in,
        # under the same char admission/pruning gates as the grid
        base_mate = jnp.where(last[mate] == last, pb[mate], total[mate])
        ext_from_mate = base_mate + lp[last]
        mate_lm_row = lm_rows(last[mate], state["last2"][mate],
                              hlm[mate] if hlm is not None else None)
        if mate_lm_row is not None:
            ext_from_mate = ext_from_mate + jnp.take_along_axis(
                mate_lm_row, last[:, None], axis=1)[:, 0]
        gate = has_mate & (lp_ext[last] >= sel_thresh)
        if prune_logp is not None:
            gate = gate & (lp_ext[last] >= prune_logp)
        ext_from_mate = jnp.where(gate, ext_from_mate, NEG_INF)
        stay_pnb = _lse2(stay_pnb, ext_from_mate)

        # ---- extension grid [K, C] -------------------------------------
        is_last = (chars_sel[None, :] == last[:, None]) & (plen > 0)[:, None]
        base = jnp.where(is_last, pb[:, None], total[:, None])
        ext_pnb = base + lp_sel[None, :]
        if lm_sel is not None:
            ext_pnb = ext_pnb + lm_sel
        ext_pnb = jnp.where((plen >= max_len)[:, None], NEG_INF, ext_pnb)
        # mask extensions whose mass went to a mate's stay:
        # excl[k, c] = exists j with mate_of_j == k and last_j == c
        excl = (match.astype(jnp.float32).T
                @ (last[:, None] == chars_sel[None, :]).astype(jnp.float32))
        ext_pnb = jnp.where(excl > 0, NEG_INF, ext_pnb)

        # ---- single top-K over the [A, K] candidate grid ---------------
        # The grid is laid out in the SAME enumeration order as the fused
        # Pallas kernel (char-major rows, beams within a row, stays on
        # the blank row) and the survivors are re-packed in enumeration
        # rank (dead slots last) — top_k breaks exact-equal-score ties by
        # lowest index, so both device search paths make IDENTICAL
        # selections and keep IDENTICAL beam orderings: parity with the
        # kernel is bit-exact, including tie-breaks (VERDICT r3 #7).
        ext_full = jnp.full((k, a), NEG_INF)
        ext_full = ext_full.at[:, chars_sel].set(ext_pnb)         # [K, A]
        stay_merged = _lse2(stay_pb, stay_pnb)
        grid = jnp.where(chars[:, None] == blank,
                         stay_merged[None, :], ext_full.T)        # [A, K]
        scores = grid.reshape(-1)
        top_score, top_idx = jax.lax.top_k(scores, k)
        dead = top_score < NEG_INF / 2
        order = jnp.argsort(jnp.where(dead, jnp.int32(a * k), top_idx))
        top_idx = top_idx[order]
        dead = dead[order]
        t_parent = top_idx % k
        cidx = top_idx // k
        is_stay = cidx == blank
        t_ext = jnp.where(is_stay, -1, cidx)
        n_pb = jnp.where(dead | ~is_stay, NEG_INF, stay_pb[t_parent])
        n_pnb = jnp.where(dead, NEG_INF,
                          jnp.where(is_stay, stay_pnb[t_parent],
                                    scores[top_idx]))

        # ---- rebuild beam state ----------------------------------------
        n_buf = state["buf"][t_parent]                         # [K, L]
        p_len = plen[t_parent]
        extend = t_ext >= 0
        pos = jnp.clip(p_len, 0, max_len - 1)
        onehot = (jnp.arange(max_len)[None, :] == pos[:, None]) \
            & extend[:, None]
        n_buf = jnp.where(onehot, t_ext[:, None], n_buf)
        n_plen = p_len + extend.astype(jnp.int32)
        n_last = jnp.where(extend, t_ext, last[t_parent])
        n_last2 = jnp.where(extend, last[t_parent], state["last2"][t_parent])
        ext_u = t_ext.astype(jnp.uint32)
        n_h1 = jnp.where(extend, state["h1"][t_parent] * _H1_MULT + ext_u,
                         state["h1"][t_parent])
        n_h2 = jnp.where(extend, state["h2"][t_parent] * _H2_MULT + ext_u,
                         state["h2"][t_parent])
        n_h1 = jnp.where(dead, beam_ids + 1, n_h1)
        n_h2 = jnp.where(dead, beam_ids + 1, n_h2)

        new_state = {"buf": n_buf, "plen": n_plen, "last": n_last,
                     "last2": n_last2, "h1": n_h1, "h2": n_h2,
                     "pb": n_pb, "pnb": n_pnb}
        if nlm_params is not None:
            hlm_parent = state["hlm"][t_parent]                # [K, H]
            hlm_ext = neural_lm.gru_step(nlm_params, hlm_parent,
                                         jnp.maximum(t_ext, 0))
            new_state["hlm"] = jnp.where(extend[:, None], hlm_ext,
                                         hlm_parent)
        active = t_i < frame_len
        merged = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(active, (1,) * new.ndim), new, old),
            new_state, state)
        return merged, None

    xs = (log_probs, jnp.arange(t_total))
    # The per-frame update is tiny ([K, A]-scale elementwise + one top-k):
    # compiled one-frame-per-iteration it is LAUNCH-BOUND (~12 fusions x
    # ~17 us/step on v5e).  Unrolling amortizes launch overhead and lets
    # XLA fuse across frames; 8 frames/iteration ~3x end-to-end.
    state, _ = jax.lax.scan(step, init, xs, unroll=unroll)

    score = _lse2(state["pb"], state["pnb"])
    best = jnp.argmax(score)
    if return_beams:
        return (state["buf"][best], state["plen"][best], score[best],
                score, state["plen"])
    return state["buf"][best], state["plen"][best], score[best]


@functools.partial(jax.jit, static_argnames=(
    "beam_width", "max_len", "blank", "lm_order", "char_topk", "prune_logp",
    "return_beams"))
def prefix_beam_search(log_probs: jnp.ndarray,
                       frame_lengths: jnp.ndarray,
                       beam_width: int = 64,
                       max_len: int = 128,
                       blank: int = 0,
                       lm_table: Optional[jnp.ndarray] = None,
                       lm_order: int = 0,
                       lm_alpha: float = 1.0,
                       lm_beta: float = 0.0,
                       nlm_params=None,
                       char_topk: int = 0,
                       prune_logp: Optional[float] = None,
                       return_beams: bool = False):
    """Batched on-device prefix beam search.

    Args:
      log_probs: [B, T, A] normalized log posteriors.
      frame_lengths: [B] valid frames.
      beam_width: beam size K (static).
      max_len: maximum hypothesis length (static).
      lm_table: optional dense char-LM log-prob table ([A], [A,A] or
        [A,A,A]) matching ``lm_order``.
      lm_alpha / lm_beta: LM weight and per-char insertion bonus.
      nlm_params: optional neural char-LM (GRU) param pytree; each beam
        entry carries its recurrent state (SURVEY C10 neural CLM).
      char_topk: static per-frame extension-char cap C (0 = exact, all
        chars); the candidate grid shrinks from [K, A] to [K, C].
      prune_logp: mask extension chars whose acoustic log-prob is below
        this threshold (the reference decoder's pruning, SURVEY C9).

    Returns:
      (hyps [B, max_len] int32, hyp_lengths [B] int32, scores [B] f32).
    """
    fn = functools.partial(
        _beam_search_single, beam_width=beam_width, max_len=max_len,
        blank=blank, lm_table=lm_table, lm_order=lm_order,
        lm_alpha=lm_alpha, lm_beta=lm_beta, nlm_params=nlm_params,
        char_topk=char_topk, prune_logp=prune_logp,
        return_beams=return_beams,
        # the per-frame body with a per-beam GRU is ~20x larger than the
        # n-gram one; unrolling 8 frames made XLA compile times explode
        # (>9 min at B=32/T=400/K=64/H=128) for little launch-overhead
        # benefit since each frame is already substantial work
        unroll=2 if nlm_params is not None else 8)
    return jax.vmap(fn)(log_probs, frame_lengths)


def make_beam_decoder(cfg, lm: Optional[NGramCharLM] = None,
                      nlm_params=None):
    """Build a (params, batch_dict) -> (hyps, lens) decode function.

    Routes through the fused Pallas kernel
    (:func:`tpu_ctc.ops.beam_pallas.beam_search_pallas`) when the config
    allows it and the kernel supports the configuration — one kernel
    program per 16-group block instead of T compiled frames (~9x on v5e
    at K=64; ~8x with a GRU char LM, whose per-beam state lives in the
    kernel; char_topk/prune_logp run in-kernel; K in (128, 256] runs the
    2-bank wide kernel, GRU LMs included).  Falls back to the XLA scan
    decoder otherwise (K>256, vocab>64, LM order>3, GRU state over the
    VMEM budget) — LOUDLY: the XLA neural search is ~8x slower with
    multi-minute compiles, so a genuine fallback logs a warning.  Note
    the fused neural path matches XLA hypotheses but scores carry
    ~1e-3-level transcendental/matmul-order drift over hundreds of
    frames (the n-gram path is bit-exact).
    """
    import logging

    from tpu_ctc.models import birnn
    from tpu_ctc.ops import beam_pallas

    lm_table = lm.tables_device() if lm is not None else None
    lm_order = lm.order if lm is not None else 0
    vocab = cfg.model.vocab_size
    want_kernel = getattr(cfg.decode, "use_fused_kernel", True)
    use_kernel = want_kernel and beam_pallas.supported(
        cfg.decode.beam_width, vocab, lm_order, nlm_params=nlm_params,
        char_topk=cfg.decode.char_topk)
    if want_kernel and not use_kernel:
        logging.getLogger("tpu_ctc.decode").warning(
            "fused beam-search kernel does not support this configuration "
            "(K=%d vocab=%d lm_order=%d neural_lm=%s) — falling back to "
            "the XLA scan search (n-gram: ~9x slower; neural LM: ~8x "
            "slower with multi-minute XLA compiles at product shapes)",
            cfg.decode.beam_width, vocab, lm_order, nlm_params is not None)

    def decode(params, batch):
        log_probs = birnn.log_posteriors(params, cfg.model, batch["feats"],
                                         batch["frame_mask"])
        max_len = min(int(batch["labels"].shape[1]) * 2 + 16,
                      int(batch["feats"].shape[1]))
        if use_kernel:
            hyps, lens, _ = beam_pallas.beam_search_pallas(
                log_probs, batch["frame_lengths"],
                beam_width=cfg.decode.beam_width, max_len=max_len,
                lm_table=lm_table, lm_order=lm_order,
                lm_alpha=cfg.decode.lm_alpha, lm_beta=cfg.decode.lm_beta,
                prune_logp=cfg.decode.prune_logp,
                char_topk=cfg.decode.char_topk, nlm_params=nlm_params)
        else:
            hyps, lens, _ = prefix_beam_search(
                log_probs, batch["frame_lengths"],
                beam_width=cfg.decode.beam_width, max_len=max_len,
                lm_table=lm_table, lm_order=lm_order,
                lm_alpha=cfg.decode.lm_alpha, lm_beta=cfg.decode.lm_beta,
                nlm_params=nlm_params,
                char_topk=cfg.decode.char_topk,
                prune_logp=cfg.decode.prune_logp)
        return hyps, lens

    return decode
