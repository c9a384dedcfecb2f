"""Fused Pallas TPU kernel for CTC prefix beam search.

Reference shape (SURVEY.md C9/§3.3): the per-frame prefix-beam update the
reference ran as a Cython CPU loop.  The XLA scan implementation in
:mod:`tpu_ctc.decode.beam` is correct but frame-launch-bound: each frame
compiles to ~12 small fusions whose [*, K] / [*, A] minor dims pad to 128
lanes, costing ~17 us/utt/frame at K=128 regardless of pruning.  This
kernel runs the ENTIRE search for one utterance in one program: all beam
state lives in VMEM across every frame, each frame is pure VPU/MXU work,
and the only HBM traffic is streaming the [A, T] posterior block in and a
[T, K] backpointer block out.

Design constraints of Mosaic (no sort, no dynamic gather/scatter) shape
the algorithm:

  * top-K selection = **threshold bisection** (60 halvings of the score
    interval => the threshold lands between the K-th and K+1-th scores)
    + **rank compaction by triangular matmuls** (lane/sublane cumsums as
    lower-triangular one-matrices on the MXU) — no sort network.
  * ALL beam-state rebuilds (the XLA version's gathers) are one-hot
    matmuls: a [K_old, K_new] selection matrix P rebuilds every state
    vector as ``P^T @ v`` — exact for f32-representable payloads; the
    32-bit rolling hashes are rebuilt as two exact 16-bit halves.
  * duplicate merging reuses beam.py's sort-free mate fold (invertible
    rolling hash -> K x K equality match), which is already matmul/
    elementwise-only.
  * the n-gram LM lookup is a context one-hot matmul
    (``tableT [A, A^o-1] @ ctx_onehot [A^o-1, K]``), not a gather.
  * hypothesis buffers never enter the kernel: each frame emits packed
    (parent | (char+1) << 8) backpointers; the path of the winning beam
    is reconstructed afterwards by one cheap reverse scan + one-hot
    compaction in XLA (off the hot loop).

Scope: n-gram LM order <= 3 and no neural LM (the XLA path remains for
those), beam_width <= 128, exact search plus optional ``prune_logp``
acoustic masking (char_topk stays XLA-only).  Interpret mode makes the
kernel CI-testable on CPU; parity vs the host dict decoder is exact.
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
# Threshold search: 8-ary interval refinement, fully VECTOR-resident
# (lo/hi live in [1,1] vregs; the 7 per-round counts are independent
# reductions that pipeline on the VPU).  The count reductions are the
# dominant cost, so arity trades rounds against counts/round: 8-ary
# (7 counts) x 10 rounds measured faster than 16-ary x 8 on v5e.
# 10 rounds shrink the interval by 8^10 = 2^30.  Since lo0/hi0 are
# actual candidate values, any two distinct f32 scores in [lo0, hi0]
# differ by >= 2^-24 * max(|lo0|,|hi0|) >= 2^-25 * (hi0 - lo0) (away
# from zero), so 2^30 lands the threshold between the K-th and K+1-th
# distinct scores; closer-than-band ties fall to candidate-index order.
_BISECT_ITERS = 10
_BISECT_ARITY = 8
_HIGHEST = jax.lax.Precision.HIGHEST


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


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _beam_kernel(lp_ref, len_ref, lm_ref, bp_ref, fin_ref,
                 pb_s, pnb_s, plen_s, last_s, last2_s, h1_s, h2_s, *,
                 k: int, a: int, blank: int, t_total: int, max_len: int,
                 lm_order: int, lm_alpha: float, lm_beta: float,
                 prune_logp: Optional[float]):
    """One utterance's full search.

    Refs: lp [T, A] f32 (posteriors, frames in sublanes: frame t is ONE
    dynamic sublane load, no lane-aligned slicing), len [1, LANE] f32,
    lm [A^(o-1), A] f32 (tableT, zero-size dummy when no LM),
    bp out [T, KP] i32 (packed parent|char+1<<8), fin out [8, KP] f32
    (rows 0..2: pb, pnb, plen).  Scratch: per-beam state rows [1, KP]
    (f32) and hashes (i32).  KP = 128 lanes; slots >= k stay dead.
    """
    kp = _LANE
    # len block is (None, 1, _LANE): batch dim squeezed -> [1, _LANE]
    frame_len = len_ref[0, 0].astype(jnp.int32)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)   # [1,KP]
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (a, 1), 0)       # [A,1]
    live_k = slot_iota < k

    # --- init: slot 0 = empty prefix, others dead with unique hashes
    pb_s[:, :] = jnp.where(slot_iota == 0, 0.0, NEG_INF)
    pnb_s[:, :] = jnp.full((1, kp), NEG_INF)
    plen_s[:, :] = jnp.zeros((1, kp), jnp.float32)
    last_s[:, :] = jnp.zeros((1, kp), jnp.float32)
    last2_s[:, :] = jnp.zeros((1, kp), jnp.float32)
    h1_s[:, :] = jnp.where(slot_iota == 0, _H1_EMPTY, slot_iota + 1)
    h2_s[:, :] = jnp.where(slot_iota == 0, _H2_EMPTY, slot_iota + 1)

    # triangular one-matrices for lane/sublane cumsums (MXU)
    ki = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
    tri_k = (ki <= kj).astype(jnp.float32)                        # [KP,KP]
    ai = jax.lax.broadcasted_iota(jnp.int32, (a, a), 0)
    aj = jax.lax.broadcasted_iota(jnp.int32, (a, a), 1)
    tri_a_strict = (ai < aj).astype(jnp.float32)                  # [A,A]

    def frame(t):
        # Frame t is one dynamic SUBLANE load of lp [T, A] (lane slices
        # would need 128-alignment; sublane ones don't), then a 32-bit
        # [1,A]->[A,1] relayout for the column-oriented grid math.
        # Payload-carrying matmuls use Precision.HIGHEST throughout: the
        # MXU's DEFAULT f32 path rounds inputs to bf16 (8 mantissa bits),
        # which silently corrupts scores and hash payloads.  Counting
        # matmuls (0/1 x small-int, f32 accumulation) are exact at
        # DEFAULT and stay there.
        lp = lp_ref[pl.ds(t, 1), :].reshape(a, 1)                 # [A,1]
        pb, pnb = pb_s[:, :], pnb_s[:, :]                         # [1,KP]
        last_f, last2_f = last_s[:, :], last2_s[:, :]
        plen = plen_s[:, :]
        h1, h2 = h1_s[:, :], h2_s[:, :]
        last_i = last_f.astype(jnp.int32)
        total = _lse2(pb, pnb)

        onehot_last = (a_iota == last_i).astype(jnp.float32)      # [A,KP]
        lp_at = jnp.sum(lp * onehot_last, axis=0, keepdims=True)  # lp[last]
        lp_blank = lp[blank, 0]

        # ---- LM rows [A, KP]: tableT [A, ctx] @ ctx_onehot [ctx, KP] --
        lm_row = None
        if lm_order == 1:
            lm_row = jnp.broadcast_to(lm_ref[:, 0:1], (a, kp))
        elif lm_order == 2:
            lm_row = jnp.dot(lm_ref[:, :], onehot_last, precision=_HIGHEST,
                             preferred_element_type=jnp.float32)
        elif lm_order == 3:
            ctx = last2_f.astype(jnp.int32) * a + last_i          # [1,KP]
            c_iota = jax.lax.broadcasted_iota(jnp.int32, (a * a, 1), 0)
            ctx_oh = (c_iota == ctx).astype(jnp.float32)          # [A^2,KP]
            lm_row = jnp.dot(lm_ref[:, :], ctx_oh, precision=_HIGHEST,
                             preferred_element_type=jnp.float32)  # [A,KP]
        if lm_row is not None:
            lm_row = lm_alpha * lm_row + lm_beta

        # ---- mate detection (sort-free merge, see decode.beam) -------
        ph1 = (h1 - last_i) * _H1_INV                             # [1,KP]
        ph2 = (h2 - last_i) * _H2_INV
        has_parent = (plen > 0) & (total > NEG_INF / 2)
        # match[j, m]: beam j's parent prefix == beam m's prefix.
        # (Mosaic can't reshape i1 vectors across the minor dim, so the
        # row-mask lands as an f32 product, not a bool &.)
        eq = ((ph1.reshape(kp, 1) == h1.reshape(1, kp))
              & (ph2.reshape(kp, 1) == h2.reshape(1, kp))
              ).astype(jnp.float32)                                # [KP,KP]
        match = eq * has_parent.astype(jnp.float32).reshape(kp, 1)
        # mate-held values via ONE stacked exact one-hot matmul (<= one 1
        # per row); M=3 instead of three M=1 launches on the MXU
        mate_in = jnp.concatenate([pb, total, last_f], axis=0)    # [3,KP]
        mate_out = jax.lax.dot_general(
            mate_in, match, (((1,), (1,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32)                   # [3,KP]
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
                preferred_element_type=jnp.float32)               # [A,KPj]
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
        ext = base + lp
        if lm_row is not None:
            ext = ext + lm_row
        if prune_logp is not None:
            ext = jnp.where(lp < prune_logp, NEG_INF, ext)
        ext = jnp.where(plen >= max_len, NEG_INF, ext)
        # extensions whose mass went to a mate's stay: excl[m, c] =
        # exists j: match[j, m] & last_j == c  ->  onehot_last @ match
        excl = jnp.dot(onehot_last, match,
                       preferred_element_type=jnp.float32)        # [A,KP]
        ext = jnp.where(excl > 0, NEG_INF, ext)
        is_blank_row = a_iota == blank
        live_cols = jnp.broadcast_to(live_k, (a, kp))
        stay_merged = _lse2(stay_pb, stay_pnb)
        cand = jnp.where(is_blank_row, stay_merged, ext)
        cand = jnp.where(live_cols, cand, NEG_INF)                # [A,KP]

        # ---- top-K: 8-ary threshold search -----------------------------
        # Start from the tightest valid bracket: when >= K live stay
        # candidates exist, the K-th best overall is >= the worst live
        # stay (stays are K distinct candidates), so lo0 = min live stay.
        # Otherwise fall back to the worst finite candidate (no live
        # candidate may be dropped when fewer than K exist).
        hi0 = jnp.max(cand, keepdims=True).reshape(1, 1)          # [1,1]
        finite = cand > NEG_INF / 2
        stay_row = cand[blank:blank + 1, :]                       # [1,KP]
        stay_fin = stay_row > NEG_INF / 2
        n_stay = jnp.sum(stay_fin.astype(jnp.float32),
                         keepdims=True).reshape(1, 1)
        min_stay = jnp.min(jnp.where(stay_fin, stay_row, hi0),
                           keepdims=True).reshape(1, 1)
        min_fin = jnp.min(jnp.where(finite, cand, hi0),
                          keepdims=True).reshape(1, 1)
        lo = jnp.where(n_stay >= k, min_stay, min_fin) - 1.0      # [1,1]
        hi = hi0
        edge_iota = (jnp.arange(1, _BISECT_ARITY, dtype=jnp.int32)
                     .reshape(1, -1).astype(jnp.float32))         # [1,15]
        kf = jnp.float32(k)
        for _ in range(_BISECT_ITERS):                # static unroll
            w = (hi - lo) * (1.0 / _BISECT_ARITY)
            cnts = []
            # independent count reductions pipeline on the VPU
            for j in range(1, _BISECT_ARITY):
                e = lo + w * j
                cnts.append(jnp.sum((cand >= e).astype(jnp.float32),
                                    keepdims=True).reshape(1, 1))
            cnt_v = jnp.concatenate(cnts, axis=1)                 # [1,15]
            e_v = lo + w * edge_iota                              # [1,15]
            ok = cnt_v >= kf
            # monotone cnt over ascending edges: bracketing pair by max/min
            lo = jnp.max(jnp.where(ok, e_v, lo),
                         keepdims=True).reshape(1, 1)
            hi = jnp.min(jnp.where(ok, hi, e_v),
                         keepdims=True).reshape(1, 1)
        # certainly-in set (>= hi has < K members) + ties filled by index
        sel_top = cand >= hi
        n_top = jnp.sum(sel_top.astype(jnp.float32),
                        keepdims=True).reshape(1, 1)
        mid_mask = (cand >= lo) & (cand < hi) & (cand > NEG_INF / 2)
        mf = mid_mask.astype(jnp.float32)
        # global candidate-order cumsum: lanes via tri_k, rows offset
        row_cum = jnp.dot(mf, tri_k, preferred_element_type=jnp.float32)
        row_tot = row_cum[:, kp - 1:kp]                           # [A,1]
        row_off = jax.lax.dot_general(
            tri_a_strict, row_tot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [A,1]
        mid_pos = row_cum + row_off                               # 1-based
        sel = sel_top | (mid_mask & (mid_pos <= (k - n_top)))

        # ---- slot compaction WITHOUT the [A,KO,KS] one-hot cube --------
        # Slot of candidate (a, o) = its global enumeration rank, so row
        # a's survivors occupy the CONTIGUOUS slot range
        # [r_off[a], r_off[a] + r_tot[a]).  That makes the slot->row map C
        # a cheap 2D range mask, and every gather below a [KS,KO]-sized
        # 2D op or an MXU matmul — nothing 3D.
        sf = sel.astype(jnp.float32)
        r_cum = jnp.dot(sf, tri_k, preferred_element_type=jnp.float32)
        r_tot = r_cum[:, kp - 1:kp]
        r_off = jax.lax.dot_general(
            tri_a_strict, r_tot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [A,1]

        slot_f = slot_iota.astype(jnp.float32)                    # [1,KP]
        cmask = ((slot_f >= r_off) & (slot_f < r_off + r_tot)
                 ).astype(jnp.float32)                            # [A,KS]
        n_csum = jnp.sum(cmask, axis=0, keepdims=True)
        live_slot = (n_csum > 0) & (slot_iota < k)
        char_slot = jnp.sum(cmask * a_iota.astype(jnp.float32),
                            axis=0, keepdims=True)                # [1,KS]
        # rank of slot s within its row, and the row's selection data
        # gathered by C^T matmuls (0/1 x small ints: exact at DEFAULT)
        row_off_s = jax.lax.dot_general(
            r_off, cmask, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [1,KS]
        rank_s = (slot_f - row_off_s).reshape(kp, 1)              # [KS,1]
        rc_sel = jax.lax.dot_general(
            cmask, r_cum, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [KS,KO]
        ss_sel = jax.lax.dot_general(
            cmask, sf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [KS,KO]
        # oh3[s, o] = 1 iff slot s's candidate came from old beam o
        oh3 = ss_sel * (rc_sel - 1.0 == rank_s).astype(jnp.float32)

        # candidate value at (char(s), parent(s)): gather the row by C,
        # then contract the parent axis against oh3
        cand_sel = jax.lax.dot_general(
            cmask, cand, (((0,), (0,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32)                   # [KS,KO]
        cand_val = jnp.sum(oh3 * cand_sel, axis=1,
                           keepdims=True).reshape(1, kp)          # [1,KS]

        # ---- stacked parent-payload picks: pick(v)[s] = v[parent(s)] --
        # TWO matmuls instead of ten M=1 launches.  Scores + plen need
        # Precision.HIGHEST (f32 payloads through a bf16-input MXU);
        # everything else is re-expressed in <= 8-bit pieces (hash bytes)
        # so the 1-pass DEFAULT f32 path (bf16 inputs, exact for ints
        # <= 256, f32 accumulation) is exact.
        def bytes_of(h):                                          # 4x[1,KP]
            return [(jax.lax.shift_right_logical(h, s) & 0xFF
                     ).astype(jnp.float32) for s in (24, 16, 8, 0)]

        hi_stack = jnp.concatenate([stay_pb, stay_pnb, plen], axis=0)
        hi_out = jax.lax.dot_general(
            hi_stack, oh3, (((1,), (1,)), ((), ())), precision=_HIGHEST,
            preferred_element_type=jnp.float32)                   # [3,KS]
        lo_stack = jnp.concatenate(
            [last_f, last2_f, slot_f] + bytes_of(h1) + bytes_of(h2), axis=0)
        lo_out = jax.lax.dot_general(
            lo_stack, oh3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [11,KS]

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
        n_plen = p_plen + extend.astype(jnp.float32)
        n_last = jnp.where(extend, char_slot, p_last)
        n_last2 = jnp.where(extend, p_last, p_last2)
        ec_i = echar.astype(jnp.int32)
        n_h1 = jnp.where(extend, p_h1 * _H1_MULT + ec_i, p_h1)
        n_h2 = jnp.where(extend, p_h2 * _H2_MULT + ec_i, p_h2)
        n_h1 = jnp.where(live_slot, n_h1, slot_iota + 1)
        n_h2 = jnp.where(live_slot, n_h2, slot_iota + 1)

        # ---- backpointers + state writeback ----------------------------
        packed = (parent_slot.astype(jnp.int32)
                  + jnp.where(extend, (ec_i + 1) * 256, 0))
        bp_ref[pl.ds(t, 1), :] = packed

        pb_s[:, :] = n_pb
        pnb_s[:, :] = n_pnb
        plen_s[:, :] = n_plen
        last_s[:, :] = n_last
        last2_s[:, :] = n_last2
        h1_s[:, :] = n_h1
        h2_s[:, :] = n_h2

    def body(t, _):
        active = t < frame_len

        @pl.when(active)
        def _():
            frame(t)

        @pl.when(jnp.logical_not(active))
        def _():
            # frozen frame: identity backpointers (stay in same slot)
            bp_ref[pl.ds(t, 1), :] = slot_iota

        return 0

    jax.lax.fori_loop(0, t_total, body, 0)
    fin = jnp.concatenate([
        pb_s[:, :], pnb_s[:, :], plen_s[:, :],
        jnp.zeros((5, _LANE), jnp.float32)], axis=0)
    fin_ref[:, :] = fin


# ---------------------------------------------------------------------------
# Host-side wrapper: kernel launch + path reconstruction
# ---------------------------------------------------------------------------

def _reconstruct(bp: jnp.ndarray, best: jnp.ndarray, plen_best: jnp.ndarray,
                 max_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Follow packed backpointers of the winning slot, newest to oldest.

    bp [B, T, KP] i32 (parent | (char+1) << 8), best [B] slot ids ->
    (hyps [B, max_len] i32, lengths [B] i32).  One reverse scan emitting
    (char, position) pairs, then a one-hot compaction matmul — all off
    the per-frame hot path.
    """
    b, t_total, kp = bp.shape

    def step(slot, bp_t):
        entry = jnp.take_along_axis(bp_t, slot[:, None], axis=1)[:, 0]
        char = entry // 256 - 1                   # -1 = stay
        parent = entry % 256
        return parent, char

    bp_rev = jnp.moveaxis(bp, 1, 0)[::-1]                         # [T,B,KP]
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
    "prune_logp"))
def beam_search_pallas(log_probs: jnp.ndarray,
                       frame_lengths: jnp.ndarray,
                       beam_width: int,
                       max_len: int,
                       blank: int = 0,
                       lm_table: Optional[jnp.ndarray] = None,
                       lm_order: int = 0,
                       lm_alpha: float = 1.0,
                       lm_beta: float = 0.0,
                       prune_logp: Optional[float] = None):
    """Batched exact prefix beam search, fully fused per utterance.

    Same contract as :func:`tpu_ctc.decode.beam.prefix_beam_search`
    (returns hyps [B, max_len], lengths [B], scores [B]); same math,
    one kernel program per utterance instead of T compiled frames.
    """
    b, t_total, a = log_probs.shape
    k = beam_width
    if not supported(k, a, lm_order):
        raise ValueError("beam_search_pallas: unsupported configuration")

    lp_t = log_probs.astype(jnp.float32)                          # [B,T,A]
    len_tile = jnp.broadcast_to(
        frame_lengths.astype(jnp.float32)[:, None, None], (b, 1, _LANE))
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
        lm_alpha=lm_alpha, lm_beta=lm_beta, prune_logp=prune_logp)

    bp, fin = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t_total, a), lambda i: (i, 0, 0),
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
            jax.ShapeDtypeStruct((b, t_total, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, _LANE), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, _LANE), jnp.float32) for _ in range(5)]
        + [pltpu.VMEM((1, _LANE), jnp.int32) for _ in range(2)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(lp_t, len_tile, lm_in)

    pb, pnb, plen = fin[:, 0, :], fin[:, 1, :], fin[:, 2, :]      # [B,KP]
    score = _lse2(pb, pnb)
    best = jnp.argmax(score, axis=1)
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    plen_best = jnp.take_along_axis(plen, best[:, None], axis=1)[:, 0]
    hyps, lens = _reconstruct(bp, best, plen_best, max_len)
    return hyps, lens, best_score
