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
                        nlm_params=None):
    """Beam search for one utterance; vmapped over the batch by the caller."""
    from tpu_ctc.decode import neural_lm

    t_total, a = log_probs.shape
    k = beam_width
    n = k * a

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
        total = _lse2(pb, pnb)                                 # [K]

        # ---- candidate grid [K, A] -----------------------------------
        is_blank = (chars == blank)[None, :]                   # [1, A]
        is_last = (chars[None, :] == state["last"][:, None]) \
            & (state["plen"] > 0)[:, None]

        # stay candidates live in the blank column: same prefix
        stay_pb = total + lp[blank]                            # [K]
        stay_pnb = jnp.where(state["plen"] > 0,
                             pnb + lp[state["last"]], NEG_INF)  # [K]

        # extension candidates (non-blank columns)
        base = jnp.where(is_last, pb[:, None], total[:, None])  # [K, A]
        ext_pnb = base + lp[None, :]
        if lm_table is not None:
            lm_row = _lm_scores(lm_table, lm_order, state["last"],
                                state["last2"])                 # [K, A]
            ext_pnb = ext_pnb + lm_alpha * lm_row + lm_beta
        if nlm_params is not None:
            nlm_row = neural_lm.log_probs(nlm_params, state["hlm"])  # [K, A]
            ext_pnb = ext_pnb + lm_alpha * nlm_row + lm_beta
        # full prefixes cannot extend
        ext_pnb = jnp.where((state["plen"] >= max_len)[:, None],
                            NEG_INF, ext_pnb)

        cand_pb = jnp.where(is_blank, stay_pb[:, None], NEG_INF)
        cand_pnb = jnp.where(is_blank, stay_pnb[:, None], ext_pnb)

        # hashes: stay keeps the prefix hash, extend rolls in the char
        c_u = chars.astype(jnp.uint32)[None, :]
        cand_h1 = jnp.where(is_blank, state["h1"][:, None],
                            state["h1"][:, None] * _H1_MULT + c_u)
        cand_h2 = jnp.where(is_blank, state["h2"][:, None],
                            state["h2"][:, None] * _H2_MULT + c_u)
        parent = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[:, None],
                                  (k, a))
        ext_char = jnp.broadcast_to(jnp.where(is_blank, -1, chars[None, :]),
                                    (k, a))

        # ---- flatten, sort by hash, merge duplicates -----------------
        flat = [x.reshape(n) for x in
                (cand_h1, cand_h2, cand_pb, cand_pnb,
                 parent.astype(jnp.int32), ext_char.astype(jnp.int32))]
        s_h1, s_h2, s_pb, s_pnb, s_parent, s_ext = jax.lax.sort(
            flat, num_keys=2)

        # A merged segment has AT MOST TWO members: string equality
        # p+c == q forces (p, c) unique, so an extension candidate can
        # only collide with the stay candidate of the equal-string beam
        # (beam prefixes are pairwise distinct by the top-k dedupe
        # invariant).  Adjacent-neighbour merging is therefore exact and
        # stays elementwise — no segment scatter/gather (which serialize
        # on TPU: they were ~95% of decode wall-clock).
        same_prev = jnp.concatenate([
            jnp.zeros((1,), bool),
            (s_h1[1:] == s_h1[:-1]) & (s_h2[1:] == s_h2[:-1])])
        first = ~same_prev
        nxt = lambda x: jnp.concatenate([x[1:], jnp.full((1,), NEG_INF)])
        m_pb = _lse2(s_pb, jnp.where(nxt(same_prev.astype(jnp.float32)) > 0,
                                     nxt(s_pb), NEG_INF))
        m_pnb = _lse2(s_pnb, jnp.where(nxt(same_prev.astype(jnp.float32)) > 0,
                                       nxt(s_pnb), NEG_INF))
        elem_score = jnp.where(first, _lse2(m_pb, m_pnb), NEG_INF)

        # ---- top-K segments ------------------------------------------
        # When fewer than K live segments exist, top_k fills slots from
        # the NEG_INF ties — which may be second members of merged pairs
        # still carrying finite (pb, pnb).  Kill fillers explicitly:
        # NEG_INF mass and a unique per-slot hash (the init convention),
        # otherwise a filler duplicates a live prefix and its mass is
        # double-counted / dropped by the pairwise merge at later frames.
        top_score, top_idx = jax.lax.top_k(elem_score, k)
        dead = top_score < NEG_INF / 2
        n_pb = jnp.where(dead, NEG_INF, m_pb[top_idx])
        n_pnb = jnp.where(dead, NEG_INF, m_pnb[top_idx])
        t_parent = s_parent[top_idx]
        t_ext = s_ext[top_idx]

        # ---- rebuild beam state --------------------------------------
        n_buf = state["buf"][t_parent]                         # [K, L]
        p_len = state["plen"][t_parent]
        extend = t_ext >= 0
        pos = jnp.clip(p_len, 0, max_len - 1)
        onehot = (jnp.arange(max_len)[None, :] == pos[:, None]) \
            & extend[:, None]
        n_buf = jnp.where(onehot, t_ext[:, None], n_buf)
        n_plen = p_len + extend.astype(jnp.int32)
        n_last = jnp.where(extend, t_ext, state["last"][t_parent])
        n_last2 = jnp.where(extend, state["last"][t_parent],
                            state["last2"][t_parent])
        n_h1 = jnp.where(dead, beam_ids + 1, s_h1[top_idx])
        n_h2 = jnp.where(dead, beam_ids + 1, s_h2[top_idx])

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
    state, _ = jax.lax.scan(step, init, xs)

    score = _lse2(state["pb"], state["pnb"])
    best = jnp.argmax(score)
    return state["buf"][best], state["plen"][best], score[best]


@functools.partial(jax.jit, static_argnames=(
    "beam_width", "max_len", "blank", "lm_order"))
def prefix_beam_search(log_probs: jnp.ndarray,
                       frame_lengths: jnp.ndarray,
                       beam_width: int = 64,
                       max_len: int = 128,
                       blank: int = 0,
                       lm_table: Optional[jnp.ndarray] = None,
                       lm_order: int = 0,
                       lm_alpha: float = 1.0,
                       lm_beta: float = 0.0,
                       nlm_params=None):
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

    Returns:
      (hyps [B, max_len] int32, hyp_lengths [B] int32, scores [B] f32).
    """
    fn = functools.partial(
        _beam_search_single, beam_width=beam_width, max_len=max_len,
        blank=blank, lm_table=lm_table, lm_order=lm_order,
        lm_alpha=lm_alpha, lm_beta=lm_beta, nlm_params=nlm_params)
    return jax.vmap(fn)(log_probs, frame_lengths)


def make_beam_decoder(cfg, lm: Optional[NGramCharLM] = None,
                      nlm_params=None):
    """Build a (params, batch_dict) -> (hyps, lens) decode function."""
    from tpu_ctc.models import birnn

    lm_table = lm.tables_device() if lm is not None else None
    lm_order = lm.order if lm is not None else 0

    def decode(params, batch):
        log_probs = birnn.log_posteriors(params, cfg.model, batch["feats"],
                                         batch["frame_mask"])
        hyps, lens, _ = prefix_beam_search(
            log_probs, batch["frame_lengths"],
            beam_width=cfg.decode.beam_width,
            max_len=min(int(batch["labels"].shape[1]) * 2 + 16,
                        int(batch["feats"].shape[1])),
            lm_table=lm_table, lm_order=lm_order,
            lm_alpha=cfg.decode.lm_alpha, lm_beta=cfg.decode.lm_beta,
            nlm_params=nlm_params)
        return hyps, lens

    return decode
