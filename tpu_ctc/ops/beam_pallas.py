"""Fused Pallas TPU kernel for CTC prefix beam search.

Reference shape (SURVEY.md C9/§3.3): the per-frame prefix-beam update the
reference ran as a Cython CPU loop.  The XLA scan implementation in
:mod:`tpu_ctc.decode.beam` is correct but frame-launch-bound: each frame
compiles to ~12 small fusions whose [*, K] / [*, A] minor dims pad to 128
lanes, costing ~17 us/utt/frame at K=128 regardless of pruning.  This
kernel runs the ENTIRE search in one program per lane-group of
utterances: all beam state lives in VMEM across every frame, each frame
is pure VPU/MXU work, and the only HBM traffic is streaming the [T, A]
posterior blocks in and a [T, K] backpointer block out.

Design constraints of Mosaic (no sort, no dynamic gather/scatter) shape
the algorithm:

  * **lane packing**: at beam width K <= 64, a single utterance uses only
    K of the 128 VPU lanes, and the whole per-frame update is
    latency-bound small-vector work.  So 128//K utterances are packed
    side by side in the lane dimension (their beams in disjoint
    lane-groups) and advance in the SAME vector ops; all cross-beam
    matrices (duplicate match, rank cumsums, slot one-hots) are
    block-diagonal, and per-utterance count/total reductions are one
    matmul against the block-structured group-sum matrix G.
  * top-K selection = **per-lane threshold refinement** (8-ary interval
    search; the per-round counts of all packed utterances come from one
    [7,128] x G matmul) + **rank compaction by triangular matmuls**
    (block-triangular cumsums on the MXU) — no sort network.
  * ALL beam-state rebuilds (the XLA version's gathers) are one-hot
    matmuls, batched into two stacked GEMMs per frame: payload f32 rows
    (scores, lengths) at Precision.HIGHEST — the MXU's default f32 path
    rounds inputs to bf16, which silently corrupts payloads — and
    small-int rows (chars, slots, the rolling hashes split into exact
    8-bit bytes) on the fast default path.
  * duplicate merging reuses beam.py's sort-free mate fold (invertible
    rolling hash -> K x K equality match), masked block-diagonal.
  * the n-gram LM lookup is a context one-hot matmul
    (``tableT [A, A^o-1] @ ctx_onehot [A^o-1, 128]``), not a gather; the
    packed utterances' contexts live in separate lanes and share it.
  * hypothesis buffers never enter the kernel: each frame emits packed
    (parent | (char+1) << 8) backpointers; the path of the winning beam
    is reconstructed afterwards by one cheap reverse scan + one-hot
    compaction in XLA (off the hot loop).

Scope: n-gram LM order <= 3 and no neural LM (the XLA path remains for
those), beam_width <= 128, any vocab <= 64 (the wrapper pads the vocab
axis to a sublane multiple — Mosaic cannot compile unaligned [A, lane]
layouts, which is why the default A=29 alphabet failed on hardware in
round 3), exact search plus optional ``prune_logp`` acoustic masking
(char_topk stays XLA-only).  Interpret mode makes the kernel CI-testable
on CPU; parity vs the host dict decoder and the XLA search is
BIT-EXACT, including tie-breaks: the top-K threshold search runs on
order-isomorphic integer keys (no residual float band) and both device
paths keep survivors in the same enumeration order (stays on the blank
row, then (char, beam); boundary ties resolved by lowest enumeration
index), so the per-frame beam states are identical arrays
(tests/test_beam_pallas.py::test_long_utterance_beam_state_parity).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANE = 128
# Same rolling-hash family as decode.beam, as wrapping int32 (identical
# bit patterns; i32 multiply wraps mod 2^32).
_H1_MULT = np.int32(np.uint32(2654435761))
_H2_MULT = np.int32(np.uint32(40503))
_H1_INV = np.int32(np.uint32(244002641))
_H2_INV = np.int32(np.uint32(1650947975))
_H1_EMPTY = np.int32(np.uint32(0x9E3779B9))
_H2_EMPTY = np.int32(np.uint32(0x85EBCA6B))

_VMEM_LIMIT = 110 * 1024 * 1024
# Threshold search: 8-ary interval refinement with per-LANE brackets (one
# independent search per packed utterance, advancing in the same vector
# ops; the 7 per-round per-utterance counts are ONE [7,128] x G matmul).
# The search runs on ORDER-ISOMORPHIC INT32 KEYS (sign-folded f32 bit
# patterns, `_ordered_key`), not on the floats: integer interval
# arithmetic has no rounding, so the bracket provably converges to
# [boundary, boundary + 1] — the selection is the EXACT top-K by score
# with enumeration-order tie-break on exact-equal scores, with no
# residual threshold band.  (The r3 float bisection left a
# spread/2^27 band that silently stalled at the f32 rounding grid;
# candidates inside it were taken by enumeration order REGARDLESS of
# score, which diverged from the XLA search's top_k — VERDICT r3 #1/#7.)
# 13 rounds: 11 shrink a full 2^32 key range below 8, two finish via the
# w >= 1 edge-coverage step.
_BISECT_ITERS = 13
_BISECT_ARITY = 8
_HIGHEST = jax.lax.Precision.HIGHEST


def _ordered_key(x):
    """Map f32 -> i32 preserving order: b >= 0 -> b, else ~b ^ (1 << 31).

    Distinct floats map to distinct keys; -0.0 sorts just below +0.0
    (indistinguishable to a float compare, deterministic and identical
    in both device search paths)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b >= 0, b,
                     jnp.bitwise_xor(jnp.bitwise_not(b),
                                     jnp.int32(-2147483648)))


def _lse2(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + 1e-37)
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(beam_width: int, vocab: int, lm_order: int,
              nlm_params=None, char_topk: int = 0) -> bool:
    return (beam_width <= _LANE and vocab <= 64 and lm_order <= 3
            and nlm_params is None and not char_topk)


def pack_factor(beam_width: int) -> int:
    """Utterances packed per kernel program (lane-groups of width 128/p)."""
    if beam_width > 64:
        return 1
    if beam_width > 32:
        return 2
    return 4


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _beam_kernel(lp_ref, len_ref, lm_ref, bp_ref, fin_ref,
                 pb_s, pnb_s, plen_s, last_s, last2_s, h1_s, h2_s, *,
                 k: int, a: int, blank: int, t_total: int, max_len: int,
                 lm_order: int, lm_alpha: float, lm_beta: float,
                 prune_logp: Optional[float], pack: int):
    """One lane-group's full search (``pack`` utterances side by side).

    Refs: lp [T, P, A] f32 (frame t of all packed utts is ONE dynamic
    sublane load), len [1, LANE] f32 (per-lane frame counts), lm
    [A^(o-1), A] f32 (tableT, zero-size dummy when no LM), bp out
    [T, LANE] i32 (packed within-utt parent | (char+1) << 8), fin out
    [8, LANE] f32 (rows 0..2: pb, pnb, plen).  Scratch: per-beam state
    rows [1, LANE] (f32) and hashes (i32).  Lane l holds slot l % KQ of
    utterance l // KQ, KQ = LANE // pack; slots >= k stay dead.
    """
    kp = _LANE
    kq = kp // pack
    f32 = jnp.float32

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)        # [1,KP]
    slot_in = lane % kq                                           # per-utt
    utt_of = lane // kq
    slot_f = slot_in.astype(f32)
    live_k = slot_in < k
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (a, 1), 0)       # [A,1]

    # --- init: slot 0 of each utt = empty prefix, others dead ----------
    pb_s[:, :] = jnp.where(slot_in == 0, 0.0, NEG_INF)
    pnb_s[:, :] = jnp.full((1, kp), NEG_INF)
    plen_s[:, :] = jnp.zeros((1, kp), f32)
    last_s[:, :] = jnp.zeros((1, kp), f32)
    last2_s[:, :] = jnp.zeros((1, kp), f32)
    h1_s[:, :] = jnp.where(slot_in == 0, _H1_EMPTY, lane + 1)
    h2_s[:, :] = jnp.where(slot_in == 0, _H2_EMPTY, lane + 1)

    # --- block-structured lane constants (all [KP,KP] 0/1 f32) ---------
    li = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
    same_g = (li // kq) == (lj // kq)
    blk = same_g.astype(f32)                 # block-diag utterance mask
    tri_blk = ((li <= lj) & same_g).astype(f32)   # within-group cumsum
    gsum = blk                               # v @ gsum = per-group totals
    # row_cum @ m_last broadcasts each group's LAST column to the group
    m_last = (same_g & (li % kq == kq - 1)).astype(f32)
    ai = jax.lax.broadcasted_iota(jnp.int32, (a, a), 0)
    aj = jax.lax.broadcasted_iota(jnp.int32, (a, a), 1)
    tri_a_strict = (ai < aj).astype(f32)                          # [A,A]

    len_vec = len_ref[0:1, :]                                     # [1,KP]
    len_max = jnp.max(len_vec)

    def frame(t):
        # Frame t of all packed utts: one dynamic SUBLANE load (lane
        # slices would need 128-alignment; sublane ones don't), then
        # per-utt [A,1] columns spread to the packed [A,KP] grid.
        lp_pa = lp_ref[pl.ds(t, 1), :, :].reshape(pack, a)        # [P,A]
        lp_g = jnp.zeros((a, kp), f32)
        for j in range(pack):
            col = lp_pa[j:j + 1, :].reshape(a, 1)                 # [A,1]
            lp_g = jnp.where(utt_of == j, col, lp_g)              # [A,KP]

        pb, pnb = pb_s[:, :], pnb_s[:, :]                         # [1,KP]
        last_f, last2_f = last_s[:, :], last2_s[:, :]
        plen = plen_s[:, :]
        h1, h2 = h1_s[:, :], h2_s[:, :]
        last_i = last_f.astype(jnp.int32)
        total = _lse2(pb, pnb)

        onehot_last = (a_iota == last_i).astype(f32)              # [A,KP]
        lp_at = jnp.sum(lp_g * onehot_last, axis=0, keepdims=True)
        lp_blank = lp_g[blank:blank + 1, :]                       # [1,KP]

        # ---- LM rows [A, KP]: tableT [A, ctx] @ ctx_onehot [ctx, KP] --
        lm_row = None
        if lm_order == 1:
            lm_row = jnp.broadcast_to(lm_ref[:, 0:1], (a, kp))
        elif lm_order == 2:
            lm_row = jnp.dot(lm_ref[:, :], onehot_last, precision=_HIGHEST,
                             preferred_element_type=f32)
        elif lm_order == 3:
            ctx = last2_f.astype(jnp.int32) * a + last_i          # [1,KP]
            c_iota = jax.lax.broadcasted_iota(jnp.int32, (a * a, 1), 0)
            ctx_oh = (c_iota == ctx).astype(f32)                  # [A^2,KP]
            lm_row = jnp.dot(lm_ref[:, :], ctx_oh, precision=_HIGHEST,
                             preferred_element_type=f32)          # [A,KP]
        if lm_row is not None:
            lm_row = lm_alpha * lm_row + lm_beta

        # ---- mate detection (sort-free merge, see decode.beam) -------
        ph1 = (h1 - last_i) * _H1_INV                             # [1,KP]
        ph2 = (h2 - last_i) * _H2_INV
        has_parent = (plen > 0) & (total > NEG_INF / 2)
        # match[j, m]: beam j's parent prefix == beam m's prefix, same
        # utterance only.  (Mosaic can't reshape i1 vectors across the
        # minor dim, so masks land as f32 products, not bool &.)
        eq = ((ph1.reshape(kp, 1) == h1.reshape(1, kp))
              & (ph2.reshape(kp, 1) == h2.reshape(1, kp))
              ).astype(f32)                                       # [KP,KP]
        match = eq * has_parent.astype(f32).reshape(kp, 1) * blk
        # mate-held values via ONE stacked exact one-hot matmul (<= one 1
        # per row); M=3 instead of three M=1 launches on the MXU
        mate_in = jnp.concatenate([pb, total, last_f], axis=0)    # [3,KP]
        mate_out = jax.lax.dot_general(
            mate_in, match, (((1,), (1,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=f32)                           # [3,KP]
        mate_pb = mate_out[0:1, :]
        mate_total = mate_out[1:2, :]
        mate_last = mate_out[2:3, :]
        has_mate = jnp.sum(match, axis=1).reshape(1, kp) > 0
        base_mate = jnp.where(mate_last == last_f, mate_pb, mate_total)
        ext_from_mate = base_mate + lp_at
        if lm_row is not None:
            # LM(ctx of mate, char last_j) = sum_a onehot_last[a,j] *
            #   (lm_row @ match^T)[a, j]
            lm_m = jax.lax.dot_general(
                lm_row, match, (((1,), (1,)), ((), ())), precision=_HIGHEST,
                preferred_element_type=f32)                       # [A,KPj]
            ext_from_mate = ext_from_mate + jnp.sum(
                onehot_last * lm_m, axis=0, keepdims=True)
        gate = has_mate
        if prune_logp is not None:
            gate = gate & (lp_at >= prune_logp)
        ext_from_mate = jnp.where(gate, ext_from_mate, NEG_INF)

        # ---- candidate grid [A, KP]: blank row = stay ------------------
        stay_pb = total + lp_blank
        stay_pnb = _lse2(jnp.where(plen > 0, pnb + lp_at, NEG_INF),
                         ext_from_mate)
        is_last_g = (a_iota == last_i) & (plen > 0)               # [A,KP]
        base = jnp.where(is_last_g, pb, total)
        ext = base + lp_g
        if lm_row is not None:
            ext = ext + lm_row
        if prune_logp is not None:
            ext = jnp.where(lp_g < prune_logp, NEG_INF, ext)
        ext = jnp.where(plen >= max_len, NEG_INF, ext)
        # extensions whose mass went to a mate's stay: excl[m, c] =
        # exists j: match[j, m] & last_j == c  ->  onehot_last @ match
        excl = jnp.dot(onehot_last, match,
                       preferred_element_type=f32)                # [A,KP]
        ext = jnp.where(excl > 0, NEG_INF, ext)
        is_blank_row = a_iota == blank
        live_cols = jnp.broadcast_to(live_k, (a, kp))
        stay_merged = _lse2(stay_pb, stay_pnb)
        cand = jnp.where(is_blank_row, stay_merged, ext)
        cand = jnp.where(live_cols, cand, NEG_INF)                # [A,KP]

        # ---- top-K: per-lane 8-ary threshold search on i32 keys --------
        # Brackets: when an utt has >= K live stay candidates, its K-th
        # best overall is >= its worst live stay (stays are K distinct
        # candidates); the GLOBAL min live stay lower-bounds every such
        # utt.  Utts with fewer live candidates fall back to the global
        # finite minimum (nothing may be dropped when < K exist).
        kcand = _ordered_key(cand)                                # [A,KP]
        finite = cand > NEG_INF / 2
        khi0 = jnp.max(kcand, keepdims=True).reshape(1, 1)
        stay_krow = kcand[blank:blank + 1, :]                     # [1,KP]
        stay_fin = finite[blank:blank + 1, :].astype(f32)
        n_stay = jnp.dot(stay_fin, gsum,
                         preferred_element_type=f32)              # [1,KP]
        min_stay = jnp.min(jnp.where(stay_fin > 0, stay_krow, khi0),
                           keepdims=True).reshape(1, 1)
        min_fin = jnp.min(jnp.where(finite, kcand, khi0),
                          keepdims=True).reshape(1, 1)
        kf = jnp.float32(k)
        lo = jnp.where(n_stay >= kf, min_stay, min_fin) - 1       # [1,KP]
        hi = jnp.broadcast_to(khi0 + 1, (1, kp))
        n_edge = _BISECT_ARITY - 1
        edge_iota = jnp.arange(1, _BISECT_ARITY,
                               dtype=jnp.int32).reshape(n_edge, 1)
        for _ in range(_BISECT_ITERS):               # static unroll
            # w ~ (hi - lo)/8 without overflow (hi - lo can exceed
            # int32 range); overshooting edges past hi is harmless —
            # any edge with count < K is a valid new hi.
            w = jnp.maximum(jax.lax.shift_right_arithmetic(hi, 3)
                            - jax.lax.shift_right_arithmetic(lo, 3), 1)
            e7 = lo + w * edge_iota                               # [7,KP]
            ge_sums = [
                jnp.sum((kcand >= e7[j:j + 1, :]).astype(f32),
                        axis=0, keepdims=True)                    # [1,KP]
                for j in range(n_edge)]
            # per-utt counts for ALL edges: one [7,KP] x G matmul
            cnt = jnp.dot(jnp.concatenate(ge_sums, axis=0), gsum,
                          preferred_element_type=f32)             # [7,KP]
            ok = cnt >= kf
            lo = jnp.max(jnp.where(ok, e7, lo), axis=0, keepdims=True)
            hi = jnp.min(jnp.where(ok, hi, e7), axis=0, keepdims=True)
        # ---- composite rank: tops first, then ties in index order ------
        # rank2(c) = per-utt enumeration rank among the strictly-above
        # set (key >= hi = score > boundary), or n_top + rank among the
        # exact boundary ties (key == lo after convergence).  Selection
        # "rank2 <= K" keeps every top and fills remaining slots with
        # boundary ties in index order — and is PREFIX-CLOSED in rank2,
        # so a survivor's slot is simply rank2 - 1: one ranking pass
        # assigns slots, no second cumsum over the selected set.
        tf = (kcand >= hi).astype(f32)
        mf = ((kcand >= lo) & (kcand < hi) & finite).astype(f32)
        # both cumsums + totals + row offsets in ONE stacked matmul each
        cum2 = jnp.dot(jnp.concatenate([tf, mf], axis=0), tri_blk,
                       preferred_element_type=f32)                # [2A,KP]
        tot2 = jnp.dot(cum2, m_last, preferred_element_type=f32)
        m_cum = cum2[a:, :]
        t_tot, m_tot = tot2[:a, :], tot2[a:, :]
        off2 = jax.lax.dot_general(
            tri_a_strict,
            jnp.concatenate([t_tot, m_tot], axis=1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                           # [A,2KP]
        t_off, m_off = off2[:, :kp], off2[:, kp:]
        # per-utt top count = last row's offset + total ([1,KP] slice)
        n_top = t_off[a - 1:a, :] + t_tot[a - 1:a, :]

        # ---- selected mask in PURE ENUMERATION ORDER -------------------
        # Survivors = every top plus the first K - n_top boundary ties in
        # enumeration order, and each survivor's slot is its enumeration
        # rank among the survivors — the same ordering the XLA search's
        # index-sorted top_k emits, so the two device paths keep
        # IDENTICAL beam layouts frame by frame (bit-exact parity).
        m_rank = m_off + m_cum                    # 1-indexed among mids
        msel = mf * (m_rank <= kf - n_top).astype(f32)
        sf = tf + msel                            # [A,KP] selected (0/1)
        cum_s = jnp.dot(sf, tri_blk, preferred_element_type=f32)
        tot_s = jnp.dot(cum_s, m_last, preferred_element_type=f32)
        off_s = jax.lax.dot_general(
            tri_a_strict, tot_s, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                           # [A,KP]

        # ---- slot compaction WITHOUT any one-hot cube ------------------
        # In enumeration order each row's survivors occupy ONE contiguous
        # within-utt slot range [off_s[a], off_s[a] + tot_s[a]): the
        # slot->row map C is a cheap 2D range mask and every gather below
        # is a [KP,KP] 2D op or an MXU matmul — nothing 3D.
        c_sel = ((slot_f >= off_s) & (slot_f < off_s + tot_s)
                 ).astype(f32)                                    # [A,KS]
        n_csum = jnp.sum(c_sel, axis=0, keepdims=True)
        live_slot = (n_csum > 0) & live_k
        char_slot = jnp.sum(c_sel * a_iota.astype(f32),
                            axis=0, keepdims=True)                # [1,KS]
        # rank of slot s within its row's range (offsets are per-lane)
        base_s = jnp.sum(c_sel * off_s, axis=0, keepdims=True)
        rank_s = (slot_f - base_s).reshape(kp, 1)                 # [KS,1]
        # gather each slot's row data: one stacked small-int matmul
        # (cumsum for the rank match + membership mask, both exact at
        # DEFAULT) and one HIGHEST matmul for the f32 scores
        gs = jax.lax.dot_general(
            c_sel, jnp.concatenate([cum_s, sf], axis=1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                           # [KS,2KP]
        cand_g = jax.lax.dot_general(
            c_sel, cand, (((0,), (0,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=f32)                           # [KS,KO]
        rc_sel = gs[:, :kp]                      # within-range cumsum
        mm_sel = gs[:, kp:]                      # is a member
        # oh3[s, o] = 1 iff slot s's candidate came from old beam o: the
        # (rank+1)-th MEMBER of its range (the cumsum also matches the
        # run of non-members after a member — mm_sel pins the member);
        # blk keeps it block-diagonal per utterance
        oh3 = mm_sel * (rc_sel - 1.0 == rank_s).astype(f32) * blk

        cand_val = jnp.sum(oh3 * cand_g, axis=1,
                           keepdims=True).reshape(1, kp)          # [1,KS]

        # ---- stacked parent-payload picks: pick(v)[s] = v[parent(s)] --
        # TWO matmuls instead of ten M=1 launches.  Scores + plen need
        # Precision.HIGHEST (f32 payloads through a bf16-input MXU);
        # everything else is re-expressed in <= 8-bit pieces (hash bytes)
        # so the 1-pass DEFAULT f32 path (bf16 inputs, exact for ints
        # <= 256, f32 accumulation) is exact.
        def bytes_of(h):                                          # 4x[1,KP]
            return [(jax.lax.shift_right_logical(h, s) & 0xFF
                     ).astype(f32) for s in (24, 16, 8, 0)]

        hi_stack = jnp.concatenate([stay_pb, stay_pnb, plen], axis=0)
        hi_out = jax.lax.dot_general(
            hi_stack, oh3, (((1,), (1,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=f32)                           # [3,KS]
        lo_stack = jnp.concatenate(
            [last_f, last2_f, slot_f] + bytes_of(h1) + bytes_of(h2), axis=0)
        lo_out = jax.lax.dot_general(
            lo_stack, oh3, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                           # [11,KS]

        p_stay_pb, p_stay_pnb = hi_out[0:1, :], hi_out[1:2, :]
        p_plen = hi_out[2:3, :]
        p_last, p_last2 = lo_out[0:1, :], lo_out[1:2, :]
        parent_slot = lo_out[2:3, :]                              # [1,KS]

        def unbytes(rows):                                        # -> i32
            b3, b2, b1, b0 = (rows[i:i + 1, :].astype(jnp.int32)
                              for i in range(4))
            return (jax.lax.shift_left(b3, 24) | jax.lax.shift_left(b2, 16)
                    | jax.lax.shift_left(b1, 8) | b0)

        p_h1 = unbytes(lo_out[3:7, :])
        p_h2 = unbytes(lo_out[7:11, :])

        sel_is_stay = char_slot == float(blank)
        # candidate masses: stay -> (stay_pb, merged stay_pnb);
        # ext -> (NEG_INF, cand value at the selected cell)
        n_pb = jnp.where(live_slot & sel_is_stay, p_stay_pb, NEG_INF)
        n_pnb = jnp.where(live_slot,
                          jnp.where(sel_is_stay, p_stay_pnb, cand_val),
                          NEG_INF)

        extend = live_slot & ~sel_is_stay
        echar = jnp.where(extend, char_slot, 0.0)
        n_plen = p_plen + extend.astype(f32)
        n_last = jnp.where(extend, char_slot, p_last)
        n_last2 = jnp.where(extend, p_last, p_last2)
        ec_i = echar.astype(jnp.int32)
        n_h1 = jnp.where(extend, p_h1 * _H1_MULT + ec_i, p_h1)
        n_h2 = jnp.where(extend, p_h2 * _H2_MULT + ec_i, p_h2)
        n_h1 = jnp.where(live_slot, n_h1, lane + 1)
        n_h2 = jnp.where(live_slot, n_h2, lane + 1)

        # ---- backpointers + per-lane state freeze ----------------------
        # utterances in the group end at different frames: lanes of a
        # finished utt freeze (identity backpointer, state kept)
        active_l = t < len_vec                                    # [1,KP]
        packed = (parent_slot.astype(jnp.int32)
                  + jnp.where(extend, (ec_i + 1) * 256, 0))
        bp_ref[pl.ds(t, 1), :] = jnp.where(active_l, packed, slot_in)

        pb_s[:, :] = jnp.where(active_l, n_pb, pb)
        pnb_s[:, :] = jnp.where(active_l, n_pnb, pnb)
        plen_s[:, :] = jnp.where(active_l, n_plen, plen)
        last_s[:, :] = jnp.where(active_l, n_last, last_f)
        last2_s[:, :] = jnp.where(active_l, n_last2, last2_f)
        h1_s[:, :] = jnp.where(active_l, n_h1, h1)
        h2_s[:, :] = jnp.where(active_l, n_h2, h2)

    def body(t, _):
        active_any = t < len_max

        @pl.when(active_any)
        def _():
            frame(t)

        @pl.when(jnp.logical_not(active_any))
        def _():
            # whole group frozen: identity backpointers
            bp_ref[pl.ds(t, 1), :] = slot_in

        return 0

    jax.lax.fori_loop(0, t_total, body, 0)
    fin = jnp.concatenate([
        pb_s[:, :], pnb_s[:, :], plen_s[:, :],
        jnp.zeros((5, _LANE), f32)], axis=0)
    fin_ref[:, :] = fin


# ---------------------------------------------------------------------------
# Host-side wrapper: kernel launch + path reconstruction
# ---------------------------------------------------------------------------

def _reconstruct(bp: jnp.ndarray, best: jnp.ndarray, plen_best: jnp.ndarray,
                 max_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Follow packed backpointers of the winning slot, newest to oldest.

    bp [B, T, KQ] i32 (parent | (char+1) << 8), best [B] slot ids ->
    (hyps [B, max_len] i32, lengths [B] i32).  One reverse scan emitting
    (char, position) pairs, then a one-hot compaction matmul — all off
    the per-frame hot path.
    """
    b, t_total, kq = bp.shape

    def step(slot, bp_t):
        entry = jnp.take_along_axis(bp_t, slot[:, None], axis=1)[:, 0]
        char = entry // 256 - 1                   # -1 = stay
        parent = entry % 256
        return parent, char

    bp_rev = jnp.moveaxis(bp, 1, 0)[::-1]                         # [T,B,KQ]
    _, chars_rev = jax.lax.scan(step, best.astype(jnp.int32), bp_rev)
    chars = chars_rev[::-1]                                       # [T,B]
    emitted = (chars >= 0).astype(jnp.int32)
    pos = jnp.cumsum(emitted, axis=0) - 1                         # [T,B]
    onehot = (pos[:, :, None] == jnp.arange(max_len)[None, None, :]) \
        & (chars >= 0)[:, :, None]
    hyps = jnp.einsum("tbl,tb->bl", onehot.astype(jnp.int32),
                      jnp.maximum(chars, 0))
    return hyps.astype(jnp.int32), plen_best.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "beam_width", "max_len", "blank", "lm_order", "lm_alpha", "lm_beta",
    "prune_logp", "return_beams"))
def beam_search_pallas(log_probs: jnp.ndarray,
                       frame_lengths: jnp.ndarray,
                       beam_width: int,
                       max_len: int,
                       blank: int = 0,
                       lm_table: Optional[jnp.ndarray] = None,
                       lm_order: int = 0,
                       lm_alpha: float = 1.0,
                       lm_beta: float = 0.0,
                       prune_logp: Optional[float] = None,
                       return_beams: bool = False):
    """Batched exact prefix beam search, fully fused.

    Same contract as :func:`tpu_ctc.decode.beam.prefix_beam_search`
    (returns hyps [B, max_len], lengths [B], scores [B]); same math, one
    kernel program per 128//K-utterance lane-group instead of T compiled
    frames per utterance.
    """
    b, t_total, a_in = log_probs.shape
    k = beam_width
    if not supported(k, a_in, lm_order):
        raise ValueError("beam_search_pallas: unsupported configuration")
    pack = pack_factor(k)
    kq = _LANE // pack
    b_pad = -(-b // pack) * pack                  # pad batch to pack size
    lp = log_probs.astype(jnp.float32)
    lens = frame_lengths.astype(jnp.int32)
    # Sublane-align the vocab axis: Mosaic cannot concat/offset [A, lane]
    # slices when A % 8 != 0 (fails to compile at the default alphabet
    # A=29 otherwise).  Padded characters get NEG_INF emissions, so they
    # are dead candidates; blank/LM indexing is unaffected (blank < a_in,
    # LM tables are padded to the same stride below).
    a = -(-a_in // 8) * 8
    if a != a_in:
        lp = jnp.pad(lp, ((0, 0), (0, 0), (0, a - a_in)),
                     constant_values=NEG_INF)
        if lm_table is not None and lm_order > 0:
            tab = lm_table.astype(jnp.float32).reshape((a_in,) * lm_order)
            lm_table = jnp.pad(
                tab, [(0, a - a_in)] * lm_order)  # zeros: rows never hit
    if b_pad != b:
        lp = jnp.pad(lp, ((0, b_pad - b), (0, 0), (0, 0)))
        lens = jnp.pad(lens, (0, b_pad - b))      # dummies: 0 frames
    groups = b_pad // pack

    lp_t = lp.reshape(groups, pack, t_total, a).transpose(0, 2, 1, 3)
    len_tile = jnp.repeat(lens.reshape(groups, pack), kq,
                          axis=1)[:, None, :]                     # [G,1,KP]
    if lm_table is None or lm_order == 0:
        lm_in = jnp.zeros((1, a, 1), jnp.float32)
        rows = 1
    else:
        # tableT [A, ctx_rows]: lm_row = tableT @ ctx_onehot in-kernel
        tab_t = lm_table.astype(jnp.float32).reshape(-1, a).T     # [A, ctx]
        rows = tab_t.shape[1]
        lm_in = tab_t[None]

    kernel = functools.partial(
        _beam_kernel, k=k, a=a, blank=blank, t_total=t_total,
        max_len=max_len, lm_order=lm_order if lm_table is not None else 0,
        lm_alpha=lm_alpha, lm_beta=lm_beta, prune_logp=prune_logp,
        pack=pack)

    bp, fin = pl.pallas_call(
        kernel,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((None, t_total, pack, a), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, a, rows), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, t_total, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((groups, t_total, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((groups, 8, _LANE), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, _LANE), jnp.float32) for _ in range(5)]
        + [pltpu.VMEM((1, _LANE), jnp.int32) for _ in range(2)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(lp_t, len_tile, lm_in)

    # unpack lane-groups back to per-utterance [B, ...] tensors
    bp = (bp.reshape(groups, t_total, pack, kq).transpose(0, 2, 1, 3)
          .reshape(b_pad, t_total, kq)[:b])
    fin = (fin.reshape(groups, 8, pack, kq).transpose(0, 2, 1, 3)
           .reshape(b_pad, 8, kq)[:b])
    pb, pnb, plen = fin[:, 0, :], fin[:, 1, :], fin[:, 2, :]      # [B,KQ]
    score = _lse2(pb, pnb)
    best = jnp.argmax(score, axis=1)
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    plen_best = jnp.take_along_axis(plen, best[:, None], axis=1)[:, 0]
    hyps, lens_out = _reconstruct(bp, best, plen_best, max_len)
    if return_beams:
        return hyps, lens_out, best_score, score[:, :k], plen[:, :k]
    return hyps, lens_out, best_score
