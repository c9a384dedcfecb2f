"""Fused Pallas TPU kernel for CTC prefix beam search.

Reference shape (SURVEY.md C9/§3.3): the per-frame prefix-beam update the
reference ran as a Cython CPU loop.  The XLA scan implementation in
:mod:`tpu_ctc.decode.beam` is correct but frame-launch-bound: each frame
compiles to ~12 small fusions whose [*, K] / [*, A] minor dims pad to 128
lanes, costing ~17 us/utt/frame at K=128 regardless of pruning.  This
kernel runs the ENTIRE search in one program per block of G
lane-groups: all beam state lives in VMEM across every frame, each frame
is pure VPU/MXU work, and the only HBM traffic is streaming the
pre-spread posterior blocks in and a [T, K] backpointer block out.

Design constraints of Mosaic (no sort, no dynamic gather/scatter) shape
the algorithm:

  * **two-level batching**: at beam width K <= 64, a single utterance
    uses only K of the 128 VPU lanes, so 128//K utterances are packed
    side by side in the lane dimension (their beams in disjoint
    lane-groups) and advance in the SAME vector ops; all cross-beam
    matrices (duplicate match, rank cumsums, slot one-hots) are
    block-diagonal, and per-utterance count/total reductions are one
    matmul against the block-structured group-sum matrix G.  And
    because the per-frame update is ~60 small ops whose ISSUE LATENCY
    dominates at [A, 128] shapes, up to 16 lane-groups are additionally
    stacked in the SUBLANE dimension and advance in the same ops:
    per-group matmuls use Mosaic's batched dot_general, shared-constant
    matmuls flatten the group dim into the M dim (2.4x over the
    r3 one-group-per-program layout).
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

Scope: n-gram LM order <= 3, optional fused GRU neural char LM (dims
zero-padded to sublane multiples; padded state slots provably stay 0),
beam_width <= 256 — K <= 128 on this lane-packed narrow kernel, K in
(128, 256] on the 2-bank wide variant (:func:`_beam_kernel_wide`,
covering the reference's canonical 100-200 widths, GRU LMs included) —
any vocab <= 64 (the wrapper pads the vocab axis to a
sublane multiple — Mosaic cannot compile unaligned [A, lane] layouts,
which is why the default A=29 alphabet failed on hardware in round 3),
exact search plus both reference pruning knobs: ``prune_logp`` acoustic
masking and ``char_topk`` (per-frame admission bar precomputed outside,
streamed, one in-kernel compare).  Interpret mode makes the kernel
CI-testable
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

    Distinct floats map to distinct keys.  -0.0 is canonicalized to
    +0.0 first (x + 0.0): a float compare treats them as equal, so
    without the fold the integer keys would order -0.0 strictly below
    +0.0 and a boundary tie landing on +-0.0 could select differently
    from the XLA search's float top_k."""
    b = jax.lax.bitcast_convert_type(x + 0.0, jnp.int32)
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


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _pad_nlm_params(nlm_params, e_pad: int, h_pad: int):
    """Zero-pad GRU dims to sublane multiples — EXACT: padded h slots
    see zero weight rows/biases, so z_pad = 0.5, cand_pad = tanh(0) = 0
    and h_new_pad = 0.5*0 + 0.5*0 = 0 forever; real slots never read
    padded slots (their weight entries are zero)."""
    def pad(x, widths):
        return jnp.pad(jnp.asarray(x, jnp.float32), widths)

    e = int(nlm_params["embed"].shape[1])
    h = int(nlm_params["bz"].shape[0])
    de, dh = e_pad - e, h_pad - h
    if not de and not dh:
        return nlm_params
    out = {"embed": pad(nlm_params["embed"], ((0, 0), (0, de))),
           "wo": pad(nlm_params["wo"], ((0, dh), (0, 0))),
           "bo": pad(nlm_params["bo"], ((0, 0),))}
    for gate in ("z", "r", "h"):
        w = jnp.asarray(nlm_params["w" + gate], jnp.float32)
        wx, wh = w[:e], w[e:]
        out["w" + gate] = jnp.concatenate(
            [pad(wx, ((0, de), (0, dh))), pad(wh, ((0, dh), (0, dh)))])
        out["b" + gate] = pad(nlm_params["b" + gate], ((0, dh),))
    return out


def supported(beam_width: int, vocab: int, lm_order: int,
              nlm_params=None, char_topk: int = 0) -> bool:
    if nlm_params is not None:
        try:
            e = nlm_params["embed"].shape[1]
            h = nlm_params["bz"].shape[0]
        except (KeyError, AttributeError, IndexError, TypeError):
            return False
        # GRU dims are zero-padded to sublane multiples of 8 by the
        # wrapper (exactly: padded h slots provably stay 0 through the
        # gates), so any E/H within the VMEM state budget fits; H is
        # bounded by the [G, H, 128] state scratch.
        if _round8(e) > 128 or _round8(h) > 256:
            return False
    # K <= 128 runs the lane-packed narrow kernel; K in (128, 256] the
    # 2-bank wide kernel (n-gram AND fused GRU LMs).
    return beam_width <= 2 * _LANE and vocab <= 64 and lm_order <= 3


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

def _beam_kernel(lp_ref, len_ref, thr_ref, lm_ref, embt_ref, wx_ref, wh_ref,
                 wo_ref, nb_ref, bp_ref, fin_ref,
                 pb_s, pnb_s, plen_s, last_s, last2_s, h1_s, h2_s, hlm_s, *,
                 g: int, k: int, a: int, blank: int, t_total: int,
                 max_len: int, lm_order: int, lm_alpha: float,
                 lm_beta: float, prune_logp: Optional[float], pack: int,
                 nlm: bool, e_dim: int, h_dim: int, topk: bool):
    """G lane-groups' full searches in ONE program (``pack`` utterances
    side by side per group, G groups stacked in the sublane dim).

    Refs: lp [G, T, A, P] f32 (frame t of a group's packed utts is one
    [A, P] minor-dim slice — lane-broadcast to the packed grid, no
    relayout), len [G, LANE] f32 (per-lane frame counts), lm
    [A, A^(o-1)] f32 (tableT, zero-size dummy when no LM), bp out
    [G, T, LANE] i32 (packed within-utt parent | (char+1) << 8), fin out
    [G, 8, LANE] f32 (rows 0..2: pb, pnb, plen).  Scratch: per-beam
    state [G, LANE] (f32 / i32 hashes).  Lane l of group q holds slot
    l % KQ of utterance q*pack + l // KQ, KQ = LANE // pack; slots >= k
    stay dead.

    Neural char LM (``nlm``; SURVEY C10, the NAACL'15 path): every beam
    lane carries its GRU state in the TRANSPOSED [G, H, LANE] scratch
    ``hlm_s`` — beams in lanes, hidden features in sublanes — which
    makes every LM op relayout-free: LM rows log_softmax(Wo h) land
    directly in the kernel's [G, A, KP] grid layout via one batched
    [A, H] x [G, H, KP] matmul, the extension char's embedding comes
    from an [E, A] x (char one-hot [G, A, KP]) matmul, gate projections
    are [3H, E/H]-stacked batched matmuls, and the parent-state rebuild
    reuses the oh3 one-hot ([G, KP, KP] x [G, H, KP]).  All
    payload-carrying matmuls run at Precision.HIGHEST.  Weight refs
    (zero-size dummies when nlm=False): embt [E, A] = embed^T, wx
    [3H, E] = (Wz|Wr|Wh) input-projection rows transposed, wh [3H, H]
    recurrent rows, wo [A, H] = Wo^T, nb [3H + A + H, 1] =
    (bz|br|bh|bo|h_bos) with bo's padded-vocab slots at NEG_INF and
    h_bos the precomputed BOS-stepped initial GRU state every beam
    starts from (neural_lm.init_state — the training convention).

    Batching G groups per program is what makes the kernel fast: each
    frame is ~60 small VPU/MXU ops whose issue latency dominates at
    [A, 128] shapes, so the r3 one-group-per-program layout paid that
    latency groups x T times; stacking G groups multiplies every op's
    useful width by G at the same issue count (per-group matmuls ride
    Mosaic's batched dot_general; shared-constant matmuls flatten the
    group dim into the M dim).
    """
    kp = _LANE
    kq = kp // pack
    ga = g * a
    f32 = jnp.float32

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)        # [1,KP]
    slot_in = lane % kq                                           # per-utt
    utt_of = lane // kq
    slot_f = slot_in.astype(f32)
    live_k = slot_in < k
    # char id of each [G*A, KP] grid row
    arow = jax.lax.broadcasted_iota(jnp.int32, (ga, 1), 0) % a    # [GA,1]

    def rep(x):
        """[G, KP] per-lane state -> [G*A, KP] char grid (row-repeat)."""
        return jnp.broadcast_to(x[:, None, :], (g, a, kp)).reshape(ga, kp)

    def red_sum(x):
        """[G*A, KP] -> [G, KP] sum over the char rows."""
        return jnp.sum(x.reshape(g, a, kp), axis=1)

    # --- init: slot 0 of each utt = empty prefix, others dead ----------
    # (first T-chunk only: state scratch persists across the sequential
    # time-chunk grid dimension)
    @pl.when(pl.program_id(1) == 0)
    def _():
        pb_s[:, :] = jnp.broadcast_to(
            jnp.where(slot_in == 0, 0.0, NEG_INF), (g, kp))
        pnb_s[:, :] = jnp.full((g, kp), NEG_INF)
        plen_s[:, :] = jnp.zeros((g, kp), f32)
        last_s[:, :] = jnp.zeros((g, kp), f32)
        last2_s[:, :] = jnp.zeros((g, kp), f32)
        h1_s[:, :] = jnp.broadcast_to(
            jnp.where(slot_in == 0, _H1_EMPTY, lane + 1), (g, kp))
        h2_s[:, :] = jnp.broadcast_to(
            jnp.where(slot_in == 0, _H2_EMPTY, lane + 1), (g, kp))
        if nlm:
            # BOS-stepped init state, broadcast to every beam lane
            h_bos = nb_ref[3 * h_dim + a:3 * h_dim + a + h_dim, 0:1]
            hlm_s[:, :, :] = jnp.broadcast_to(h_bos[None], (g, h_dim, kp))

    # --- block-structured lane constants (all [KP,KP] 0/1 f32) ---------
    li = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
    same_g = (li // kq) == (lj // kq)
    blk = same_g.astype(f32)                 # block-diag utterance mask
    tri_blk = ((li <= lj) & same_g).astype(f32)   # within-group cumsum
    gsum = blk                               # v @ gsum = per-group totals
    # row_cum @ m_last broadcasts each group's LAST column to the group
    m_last = (same_g & (li % kq == kq - 1)).astype(f32)
    # strict upper-tri over char rows, block-diag over the G groups:
    # left-multiplying [GA, M] accumulates per-group row offsets
    gi = jax.lax.broadcasted_iota(jnp.int32, (ga, ga), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (ga, ga), 1)
    tri_ga_strict = (((gi // a) == (gj // a))
                     & (gi % a < gj % a)).astype(f32)             # [GA,GA]

    len_vec = len_ref[:, :]                                       # [G,KP]
    len_max = jnp.max(len_vec)

    ti = pl.program_id(1)
    nt = pl.num_programs(1)
    tc = lp_ref.shape[1]

    # LM table broadcast to the group dim once (shared across frames);
    # zero-size dummy when no LM.
    rows = lm_ref.shape[1]
    lm_b = jnp.broadcast_to(lm_ref[:, :][None], (g, a, rows))

    def bdot(x, y, dims, precision=None):
        return jax.lax.dot_general(
            x, y, (dims, ((0,), (0,))), precision=precision,
            preferred_element_type=f32)

    def frame(i):
        t = ti * tc + i
        # Frame t of all groups: one dynamic second-dim slice of the
        # PRE-SPREAD [G, Tc, A, KP] block (the wrapper lane-repeats each
        # packed utterance's [T, A] posteriors to its kq lanes, so the
        # kernel does zero per-frame spreading/relayout work).
        lp_g = lp_ref[:, pl.ds(i, 1), :, :].reshape(ga, kp)       # [GA,KP]

        pb, pnb = pb_s[:, :], pnb_s[:, :]                         # [G,KP]
        last_f, last2_f = last_s[:, :], last2_s[:, :]
        plen = plen_s[:, :]
        h1, h2 = h1_s[:, :], h2_s[:, :]
        last_i = last_f.astype(jnp.int32)
        total = _lse2(pb, pnb)

        onehot_last = (arow == rep(last_f).astype(jnp.int32)
                       ).astype(f32)                              # [GA,KP]
        lp_at = red_sum(lp_g * onehot_last)                       # [G,KP]
        lp_blank = lp_g.reshape(g, a, kp)[:, blank, :]            # [G,KP]

        # ---- LM rows [GA, KP]: batched tableT @ ctx_onehot ------------
        lm_row = None
        oh3l = onehot_last.reshape(g, a, kp)
        if lm_order == 1:
            lm_row = jnp.broadcast_to(
                lm_ref[:, 0:1][None], (g, a, kp)).reshape(ga, kp)
        elif lm_order == 2:
            lm_row = bdot(lm_b, oh3l, ((2,), (1,)),
                          precision=_HIGHEST).reshape(ga, kp)
        elif lm_order == 3:
            ctx = last2_f.astype(jnp.int32) * a + last_i          # [G,KP]
            c_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, a * a, 1), 1)
            ctx_oh = (c_iota == ctx[:, None, :]).astype(f32)      # [G,A2,KP]
            lm_row = bdot(lm_b, ctx_oh, ((2,), (1,)),
                          precision=_HIGHEST).reshape(ga, kp)
        if lm_row is not None:
            lm_row = lm_alpha * lm_row + lm_beta
        if nlm:
            # neural rows: log_softmax(Wo h + bo)[c] per beam, computed
            # directly in the [G, A, KP] grid layout (see docstring);
            # blank masked like neural_lm.log_probs, padded-vocab slots
            # masked by bo's NEG_INF pad
            hlm = hlm_s[:, :, :]                              # [G,H,KP]
            wo_b = jnp.broadcast_to(wo_ref[:, :][None], (g, a, h_dim))
            lgt = bdot(wo_b, hlm, ((2,), (1,)), precision=_HIGHEST)
            bo_col = nb_ref[3 * h_dim:3 * h_dim + a, 0:1]     # [A,1]
            lgt = lgt + bo_col[None]
            lgt = lgt + jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, a, 1), 1) == blank,
                -1e30, 0.0)
            shifted = lgt - jnp.max(lgt, axis=1, keepdims=True)
            lsm = shifted - jnp.log(
                jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
            nrow = (lm_alpha * lsm.reshape(ga, kp) + lm_beta)
            lm_row = nrow if lm_row is None else lm_row + nrow

        # ---- mate detection (sort-free merge, see decode.beam) -------
        ph1 = (h1 - last_i) * _H1_INV                             # [G,KP]
        ph2 = (h2 - last_i) * _H2_INV
        has_parent = (plen > 0) & (total > NEG_INF / 2)
        # match[g, j, m]: beam j's parent prefix == beam m's prefix,
        # same utterance only.
        eq = ((ph1[:, :, None] == h1[:, None, :])
              & (ph2[:, :, None] == h2[:, None, :])
              ).astype(f32)                                       # [G,KP,KP]
        match = eq * has_parent.astype(f32)[:, :, None] * blk[None]
        # mate-held values via ONE stacked exact one-hot matmul (<= one
        # 1 per row); M=3 instead of three M=1 launches on the MXU
        mate_in = jnp.concatenate(
            [pb[:, None, :], total[:, None, :], last_f[:, None, :]],
            axis=1)                                               # [G,3,KP]
        mate_out = bdot(mate_in, match, ((2,), (2,)),
                        precision=_HIGHEST)                       # [G,3,KP]
        mate_pb = mate_out[:, 0, :]
        mate_total = mate_out[:, 1, :]
        mate_last = mate_out[:, 2, :]
        has_mate = jnp.sum(match, axis=2) > 0                     # [G,KP]
        base_mate = jnp.where(mate_last == last_f, mate_pb, mate_total)
        ext_from_mate = base_mate + lp_at
        if lm_row is not None:
            # LM(ctx of mate, char last_j) = sum_a onehot_last[a,j] *
            #   (lm_row @ match^T)[a, j]
            lm_m = bdot(lm_row.reshape(g, a, kp), match, ((2,), (2,)),
                        precision=_HIGHEST)                       # [G,A,KP]
            ext_from_mate = ext_from_mate + red_sum(
                onehot_last * lm_m.reshape(ga, kp))
        # char_topk acoustic pruning (SURVEY C9): the per-frame admission
        # bar (C-th largest non-blank log-prob) is PRE-COMPUTED outside —
        # it depends only on (utterance, frame), never on beam state — and
        # streamed as one [G, Tc, KP] block; in-kernel it is one compare.
        # Same threshold semantics as the XLA path's mate gate; on an
        # exact-equal score AT the bar the ext grid admits all tied chars
        # where XLA's top_k keeps the lowest-indexed (measure-zero).
        thr_row = None
        if topk:
            thr_row = thr_ref[:, pl.ds(i, 1), :].reshape(g, kp)   # [G,KP]
        gate = has_mate
        if topk:
            gate = gate & (lp_at >= thr_row)
        if prune_logp is not None:
            gate = gate & (lp_at >= prune_logp)
        ext_from_mate = jnp.where(gate, ext_from_mate, NEG_INF)

        # ---- candidate grid [GA, KP]: blank rows = stay ----------------
        stay_pb = total + lp_blank
        stay_pnb = _lse2(jnp.where(plen > 0, pnb + lp_at, NEG_INF),
                         ext_from_mate)
        is_last_g = (onehot_last > 0) & (rep(plen) > 0)
        base = jnp.where(is_last_g, rep(pb), rep(total))
        ext = base + lp_g
        if lm_row is not None:
            ext = ext + lm_row
        if topk:
            ext = jnp.where(lp_g < rep(thr_row), NEG_INF, ext)
        if prune_logp is not None:
            ext = jnp.where(lp_g < prune_logp, NEG_INF, ext)
        ext = jnp.where(rep(plen) >= max_len, NEG_INF, ext)
        # extensions whose mass went to a mate's stay: excl[m, c] =
        # exists j: match[j, m] & last_j == c  ->  onehot_last @ match
        excl = bdot(oh3l, match, ((2,), (1,)))                    # [G,A,KP]
        ext = jnp.where(excl.reshape(ga, kp) > 0, NEG_INF, ext)
        is_blank_row = arow == blank
        live_cols = jnp.broadcast_to(live_k, (ga, kp))
        stay_merged = _lse2(stay_pb, stay_pnb)
        cand = jnp.where(is_blank_row, rep(stay_merged), ext)
        cand = jnp.where(live_cols, cand, NEG_INF)                # [GA,KP]

        # ---- top-K: per-lane 8-ary threshold search on i32 keys --------
        # Brackets: when an utt has >= K live stay candidates, its K-th
        # best overall is >= its worst live stay (stays are K distinct
        # candidates); the per-GROUP min live stay lower-bounds every
        # such utt.  Utts with fewer live candidates fall back to the
        # group finite minimum (nothing may be dropped when < K exist).
        kcand = _ordered_key(cand)                                # [GA,KP]
        kcand3 = kcand.reshape(g, a, kp)
        finite = cand > NEG_INF / 2
        # (all reductions keep >= 2 dims: Mosaic's layout inference
        # CHECK-fails on rank-1 vectors)
        khi0 = jnp.max(jnp.max(kcand3, axis=2), axis=1,
                       keepdims=True)                             # [G,1]
        stay_krow = kcand3[:, blank, :]                           # [G,KP]
        stay_fin = finite.reshape(g, a, kp)[:, blank, :].astype(f32)
        n_stay = jnp.dot(stay_fin, gsum,
                         preferred_element_type=f32)              # [G,KP]
        khi0_b = jnp.broadcast_to(khi0, (g, kp))
        min_stay = jnp.min(jnp.where(stay_fin > 0, stay_krow, khi0_b),
                           axis=1, keepdims=True)                 # [G,1]
        min_fin = jnp.min(jnp.min(
            jnp.where(finite, kcand, rep(khi0_b)).reshape(g, a, kp),
            axis=2), axis=1, keepdims=True)                       # [G,1]
        kf = jnp.float32(k)
        lo = jnp.where(n_stay >= kf, jnp.broadcast_to(min_stay, (g, kp)),
                       jnp.broadcast_to(min_fin, (g, kp))) - 1    # [G,KP]
        hi = khi0_b + 1
        n_edge = _BISECT_ARITY - 1
        edge_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_edge, 1, 1), 0) + 1
        for _ in range(_BISECT_ITERS):               # static unroll
            # w ~ (hi - lo)/8 without overflow (hi - lo can exceed
            # int32 range); overshooting edges past hi is harmless —
            # any edge with count < K is a valid new hi.
            w = jnp.maximum(jax.lax.shift_right_arithmetic(hi, 3)
                            - jax.lax.shift_right_arithmetic(lo, 3), 1)
            e7 = lo[None] + w[None] * edge_iota                   # [7,G,KP]
            # per-edge loop: a fused 4D [7,G,A,KP] compare+reduce is
            # semantically identical but crashes Mosaic's remote
            # compile on this toolchain — keep the 3D ops
            ge = jnp.stack(
                [jnp.sum((kcand3 >= e7[j][:, None, :]).astype(f32),
                         axis=1)                                  # [G,KP]
                 for j in range(n_edge)], axis=0)                 # [7,G,KP]
            # per-utt counts for ALL edges/groups: one [7G,KP] matmul
            cnt = jnp.dot(ge.reshape(n_edge * g, kp), gsum,
                          preferred_element_type=f32
                          ).reshape(n_edge, g, kp)
            ok = cnt >= kf
            lo = jnp.max(jnp.where(ok, e7, lo[None]), axis=0)
            hi = jnp.min(jnp.where(ok, hi[None], e7), axis=0)
        # tops = strictly above the boundary; mids = exact boundary ties
        tf = (kcand >= rep(hi)).astype(f32)
        mf = ((kcand >= rep(lo)) & (kcand < rep(hi)) & finite).astype(f32)
        # both cumsums + totals + row offsets in ONE stacked matmul each
        cum2 = jnp.dot(
            jnp.concatenate([tf.reshape(g, a, kp), mf.reshape(g, a, kp)],
                            axis=1).reshape(2 * ga, kp),
            tri_blk, preferred_element_type=f32)                  # [2GA,KP]
        tot2 = jnp.dot(cum2, m_last, preferred_element_type=f32)
        cum23 = cum2.reshape(g, 2 * a, kp)
        tot23 = tot2.reshape(g, 2 * a, kp)
        m_cum = cum23[:, a:, :].reshape(ga, kp)
        t_tot = tot23[:, :a, :].reshape(ga, kp)
        m_tot = tot23[:, a:, :].reshape(ga, kp)
        off2 = jax.lax.dot_general(
            tri_ga_strict,
            jnp.concatenate([t_tot, m_tot], axis=1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                           # [GA,2KP]
        t_off, m_off = off2[:, :kp], off2[:, kp:]
        # per-utt top count = last row's offset + total ([G,KP] slice)
        n_top = (t_off.reshape(g, a, kp)[:, a - 1, :]
                 + t_tot.reshape(g, a, kp)[:, a - 1, :])          # [G,KP]

        # ---- selected mask in PURE ENUMERATION ORDER -------------------
        # Survivors = every top plus the first K - n_top boundary ties in
        # enumeration order, and each survivor's slot is its enumeration
        # rank among the survivors — the same ordering the XLA search's
        # index-sorted top_k emits, so the two device paths keep
        # IDENTICAL beam layouts frame by frame (bit-exact parity).
        m_rank = m_off + m_cum                    # 1-indexed among mids
        msel = mf * (m_rank <= rep(kf - n_top)).astype(f32)
        sf = tf + msel                            # [GA,KP] selected
        cum_s = jnp.dot(sf, tri_blk, preferred_element_type=f32)
        tot_s = jnp.dot(cum_s, m_last, preferred_element_type=f32)
        off_s = jax.lax.dot_general(
            tri_ga_strict, tot_s, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                           # [GA,KP]

        # ---- slot compaction WITHOUT any one-hot cube ------------------
        # In enumeration order each row's survivors occupy ONE contiguous
        # within-utt slot range [off_s[a], off_s[a] + tot_s[a]): the
        # slot->row map C is a cheap range mask and every gather below
        # is elementwise or a (batched) MXU matmul.
        c_sel = ((slot_f >= off_s) & (slot_f < off_s + tot_s)
                 ).astype(f32)                                    # [GA,KP]
        c_sel3 = c_sel.reshape(g, a, kp)
        n_csum = red_sum(c_sel)                                   # [G,KP]
        live_slot = (n_csum > 0) & live_k
        char_slot = red_sum(c_sel * arow.astype(f32))             # [G,KP]
        # rank of slot s within its row's range (offsets are per-lane)
        base_s = red_sum(c_sel * off_s)
        rank_s = (slot_f - base_s)[:, :, None]                    # [G,KP,1]
        # gather each slot's row data: one stacked small-int matmul
        # (cumsum for the rank match + membership mask, both exact at
        # DEFAULT) and one HIGHEST matmul for the f32 scores
        gs = bdot(c_sel3,
                  jnp.concatenate([cum_s.reshape(g, a, kp),
                                   sf.reshape(g, a, kp)], axis=2),
                  ((1,), (1,)))                                   # [G,KP,2KP]
        cand_g = bdot(c_sel3, cand.reshape(g, a, kp), ((1,), (1,)),
                      precision=_HIGHEST)                         # [G,KP,KP]
        rc_sel = gs[:, :, :kp]                   # within-range cumsum
        mm_sel = gs[:, :, kp:]                   # is a member
        # oh3[g, s, o] = 1 iff slot s's candidate came from old beam o:
        # the (rank+1)-th MEMBER of its range (the cumsum also matches
        # the run of non-members after a member — mm_sel pins the
        # member); blk keeps it block-diagonal per utterance
        oh3 = mm_sel * (rc_sel - 1.0 == rank_s).astype(f32) * blk[None]

        cand_val = jnp.sum(oh3 * cand_g, axis=2)                  # [G,KP]

        # ---- stacked parent-payload picks: pick(v)[s] = v[parent(s)] --
        # TWO matmuls instead of ten M=1 launches.  Scores + plen need
        # Precision.HIGHEST (f32 payloads through a bf16-input MXU);
        # everything else is re-expressed in <= 8-bit pieces (hash bytes)
        # so the 1-pass DEFAULT f32 path (bf16 inputs, exact for ints
        # <= 256, f32 accumulation) is exact.
        def bytes_of(h):                                      # 4x[G,1,KP]
            return [(jax.lax.shift_right_logical(h, sh) & 0xFF
                     ).astype(f32)[:, None, :] for sh in (24, 16, 8, 0)]

        hi_stack = jnp.concatenate(
            [stay_pb[:, None, :], stay_pnb[:, None, :],
             plen[:, None, :]], axis=1)                           # [G,3,KP]
        hi_out = bdot(hi_stack, oh3, ((2,), (2,)),
                      precision=_HIGHEST)                         # [G,3,KP]
        lo_stack = jnp.concatenate(
            [last_f[:, None, :], last2_f[:, None, :],
             jnp.broadcast_to(slot_f[None], (g, 1, kp))]
            + bytes_of(h1) + bytes_of(h2), axis=1)                # [G,11,KP]
        lo_out = bdot(lo_stack, oh3, ((2,), (2,)))                # [G,11,KP]

        p_stay_pb, p_stay_pnb = hi_out[:, 0, :], hi_out[:, 1, :]
        p_plen = hi_out[:, 2, :]
        p_last, p_last2 = lo_out[:, 0, :], lo_out[:, 1, :]
        parent_slot = lo_out[:, 2, :]                             # [G,KP]

        def unbytes(rows):                                        # -> i32
            b3, b2, b1, b0 = (rows[:, i, :].astype(jnp.int32)
                              for i in range(4))
            return (jax.lax.shift_left(b3, 24) | jax.lax.shift_left(b2, 16)
                    | jax.lax.shift_left(b1, 8) | b0)

        p_h1 = unbytes(lo_out[:, 3:7, :])
        p_h2 = unbytes(lo_out[:, 7:11, :])

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
        # utterances end at different frames: lanes of a finished utt
        # freeze (identity backpointer, state kept)
        active_l = t < len_vec                                    # [G,KP]
        packed = (parent_slot.astype(jnp.int32)
                  + jnp.where(extend, (ec_i + 1) * 256, 0))
        bp_ref[:, pl.ds(i, 1), :] = jnp.where(
            active_l, packed, jnp.broadcast_to(slot_in, (g, kp))
            )[:, None, :]

        pb_s[:, :] = jnp.where(active_l, n_pb, pb)
        pnb_s[:, :] = jnp.where(active_l, n_pnb, pnb)
        plen_s[:, :] = jnp.where(active_l, n_plen, plen)
        last_s[:, :] = jnp.where(active_l, n_last, last_f)
        last2_s[:, :] = jnp.where(active_l, n_last2, last2_f)
        h1_s[:, :] = jnp.where(active_l, n_h1, h1)
        h2_s[:, :] = jnp.where(active_l, n_h2, h2)

        if nlm:
            # ---- GRU state rebuild + advance (transposed layout) -------
            # parent pick via the same oh3 one-hot; extended slots step
            # the GRU on their extension char (gru_step in neural_lm.py)
            h_par = bdot(hlm, oh3, ((2,), (2,)),
                         precision=_HIGHEST)                  # [G,H,KPs]
            aoh = (jax.lax.broadcasted_iota(jnp.int32, (1, a, 1), 1)
                   == ec_i[:, None, :]).astype(f32)           # [G,A,KP]
            embt_b = jnp.broadcast_to(embt_ref[:, :][None], (g, e_dim, a))
            x_t = bdot(embt_b, aoh, ((2,), (1,)),
                       precision=_HIGHEST)                    # [G,E,KP]
            wx_b = jnp.broadcast_to(wx_ref[:, :][None],
                                    (g, 3 * h_dim, e_dim))
            xg = bdot(wx_b, x_t, ((2,), (1,)),
                      precision=_HIGHEST)                     # [G,3H,KP]
            wh_zr = jnp.broadcast_to(wh_ref[0:2 * h_dim, :][None],
                                     (g, 2 * h_dim, h_dim))
            hg = bdot(wh_zr, h_par, ((2,), (1,)),
                      precision=_HIGHEST)                     # [G,2H,KP]
            b_zr = nb_ref[0:2 * h_dim, 0:1]                   # [2H,1]
            zr = jax.nn.sigmoid(xg[:, :2 * h_dim, :] + hg + b_zr[None])
            z_g, r_g = zr[:, :h_dim, :], zr[:, h_dim:, :]
            wh_c = jnp.broadcast_to(wh_ref[2 * h_dim:, :][None],
                                    (g, h_dim, h_dim))
            cg = bdot(wh_c, r_g * h_par, ((2,), (1,)),
                      precision=_HIGHEST)                     # [G,H,KP]
            b_h = nb_ref[2 * h_dim:3 * h_dim, 0:1]
            cand_h = jnp.tanh(xg[:, 2 * h_dim:, :] + cg + b_h[None])
            h_new = (1.0 - z_g) * h_par + z_g * cand_h
            h_next = jnp.where(extend[:, None, :], h_new, h_par)
            hlm_s[:, :, :] = jnp.where(active_l[:, None, :], h_next, hlm)

    def body(i, _):
        active_any = ti * tc + i < len_max

        @pl.when(active_any)
        def _():
            frame(i)

        @pl.when(jnp.logical_not(active_any))
        def _():
            # whole block frozen: identity backpointers
            bp_ref[:, pl.ds(i, 1), :] = jnp.broadcast_to(
                slot_in, (g, kp))[:, None, :]

        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(ti == nt - 1)
    def _():
        fin_ref[:, :, :] = jnp.concatenate([
            pb_s[:, :][:, None, :], pnb_s[:, :][:, None, :],
            plen_s[:, :][:, None, :],
            jnp.zeros((g, 5, _LANE), f32)], axis=1)


def _beam_kernel_wide(lp_ref, len_ref, thr_ref, lm_ref, embt_ref, wx_ref,
                      wh_ref, wo_ref, nb_ref, bp_ref, fin_ref,
                      pb_s, pnb_s, plen_s, last_s, last2_s, h1_s, h2_s,
                      hlm_s, *,
                      g: int, k: int, a: int, nb: int, blank: int,
                      max_len: int, lm_order: int, lm_alpha: float,
                      lm_beta: float, prune_logp: Optional[float],
                      topk: bool, nlm: bool, e_dim: int, h_dim: int):
    """Wide-beam variant: K in (128, 256] via NB=ceil(K/128) lane BANKS.

    One utterance per lane-group (pack=1 — at K>128 nothing else fits),
    each beam slot s = bank*128 + lane, per-beam state in [G, NB, KP]
    scratches.  The candidate grid generalizes from A char-rows to
    R = A*NB (char, parent-bank) rows, ordered row = char*NB + bank so
    flat enumeration (row, lane) == the XLA search's (char, beam) order
    — the whole integer-key threshold search and enumeration-order
    range-mask compaction carry over with rows := R; per-group counts
    are plain (row, lane) reductions (no packing block structure).
    Cross-bank interactions — mate matching, mate payload folds, parent
    payload picks — run as static NB x NB blocks of the narrow kernel's
    [KP, KP] matmuls (beam search's intrinsic O(K^2) merge cost).
    The fused GRU neural char LM runs here too: per-beam state lives in
    a bank-major [G, NB*H, KP] scratch (row bank*H + j), LM rows and the
    parent-state rebuild run per bank with the same NB x NB one-hot
    blocks as the payload picks — the NAACL'15 neural decode at its
    canonical 100-200 beam widths, fully in-kernel.
    bp packs (parent_slot | (char+1) << 8) with parent_slot <= 255, so
    :func:`_reconstruct` works unchanged on the [B, T, NB*KP] unpacking.
    """
    kp = _LANE
    r = a * nb
    gr = g * r
    f32 = jnp.float32
    i32 = jnp.int32

    lane2 = jax.lax.broadcasted_iota(i32, (1, kp), 1)             # [1,KP]
    bank_i = jax.lax.broadcasted_iota(i32, (1, nb, 1), 1)
    lane3 = jax.lax.broadcasted_iota(i32, (1, nb, kp), 2)
    slot_g3 = bank_i * kp + lane3                                 # [1,NB,KP]
    live_b = slot_g3 < k
    rowi = jax.lax.broadcasted_iota(i32, (gr, 1), 0) % r
    crow = rowi // nb                                             # char
    brow = rowi % nb                                              # parent bank

    def rep(x):
        """[G, NB, KP] per-beam -> [GR, KP] rows (row = char*NB + bank)."""
        return jnp.broadcast_to(x[:, None, :, :], (g, a, nb, kp)
                                ).reshape(gr, kp)

    def rep_c(x):
        """[G, A, KP] per-char -> [GR, KP] rows."""
        return jnp.broadcast_to(x[:, :, None, :], (g, a, nb, kp)
                                ).reshape(gr, kp)

    def bcast_g(x):
        """[G, KP] per-group -> [GR, KP] rows."""
        return jnp.broadcast_to(x[:, None, :], (g, r, kp)).reshape(gr, kp)

    @pl.when(pl.program_id(1) == 0)
    def _():
        first = slot_g3 == 0
        pb_s[:, :, :] = jnp.broadcast_to(
            jnp.where(first, 0.0, NEG_INF), (g, nb, kp))
        pnb_s[:, :, :] = jnp.full((g, nb, kp), NEG_INF)
        plen_s[:, :, :] = jnp.zeros((g, nb, kp), f32)
        last_s[:, :, :] = jnp.zeros((g, nb, kp), f32)
        last2_s[:, :, :] = jnp.zeros((g, nb, kp), f32)
        h1_s[:, :, :] = jnp.broadcast_to(
            jnp.where(first, _H1_EMPTY, slot_g3 + 1), (g, nb, kp))
        h2_s[:, :, :] = jnp.broadcast_to(
            jnp.where(first, _H2_EMPTY, slot_g3 + 1), (g, nb, kp))
        if nlm:
            # BOS-stepped init state for every beam of every bank
            h_bos = nb_ref[3 * h_dim + a:3 * h_dim + a + h_dim, 0:1]
            bc = jnp.broadcast_to(h_bos[None], (g, h_dim, kp))
            hlm_s[:, :, :] = jnp.concatenate([bc] * nb, axis=1)

    li = jax.lax.broadcasted_iota(i32, (kp, kp), 0)
    lj = jax.lax.broadcasted_iota(i32, (kp, kp), 1)
    tri_lane = (li <= lj).astype(f32)          # inclusive lane cumsum
    m_last = (li == kp - 1).astype(f32)        # broadcast lane-127 value
    gi = jax.lax.broadcasted_iota(i32, (gr, gr), 0)
    gj = jax.lax.broadcasted_iota(i32, (gr, gr), 1)
    tri_row_strict = (((gi // r) == (gj // r)) & (gi % r < gj % r)
                      ).astype(f32)                               # [GR,GR]

    len_vec = len_ref[:, :]                                       # [G,KP]
    len_max = jnp.max(len_vec)
    ti = pl.program_id(1)
    ntp = pl.num_programs(1)
    tc = lp_ref.shape[1]
    rows_lm = lm_ref.shape[1]
    lm_b = jnp.broadcast_to(lm_ref[:, :][None], (g, a, rows_lm))

    def bdot(x, y, dims, precision=None):
        return jax.lax.dot_general(
            x, y, (dims, ((0,), (0,))), precision=precision,
            preferred_element_type=f32)

    def bytes_of(h):                                          # 4x[G,1,KP]
        return [(jax.lax.shift_right_logical(h, sh) & 0xFF
                 ).astype(f32)[:, None, :] for sh in (24, 16, 8, 0)]

    def unbytes(rows):                                        # -> i32
        b3, b2, b1, b0 = (rows[:, i, :].astype(i32) for i in range(4))
        return (jax.lax.shift_left(b3, 24) | jax.lax.shift_left(b2, 16)
                | jax.lax.shift_left(b1, 8) | b0)

    def frame(i):
        t = ti * tc + i
        lp_c = lp_ref[:, pl.ds(i, 1), :, :].reshape(g, a, kp)     # [G,A,KP]
        lp_row = rep_c(lp_c)                                      # [GR,KP]

        pb, pnb = pb_s[:, :, :], pnb_s[:, :, :]                   # [G,NB,KP]
        last_f, last2_f = last_s[:, :, :], last2_s[:, :, :]
        plen = plen_s[:, :, :]
        h1, h2 = h1_s[:, :, :], h2_s[:, :, :]
        last_i = last_f.astype(i32)
        total = _lse2(pb, pnb)

        onehot_last = (crow == rep(last_f).astype(i32)
                       ).astype(f32)                              # [GR,KP]
        lp_at = jnp.sum((lp_row * onehot_last).reshape(g, a, nb, kp),
                        axis=1)                                   # [G,NB,KP]
        lp_blank = lp_c[:, blank, :][:, None, :]                  # [G,1,KP]
        a_iota = jax.lax.broadcasted_iota(i32, (1, a, 1), 1)
        oh_b = [(a_iota == last_i[:, mb, :][:, None, :]).astype(f32)
                for mb in range(nb)]                              # [G,A,KP]

        # ---- LM rows per context bank ---------------------------------
        lm_rows_b = None
        lm_row = None
        if lm_order:
            lm_rows_b = []
            for mb in range(nb):
                if lm_order == 1:
                    row_b = jnp.broadcast_to(lm_ref[:, 0:1][None],
                                             (g, a, kp))
                elif lm_order == 2:
                    row_b = bdot(lm_b, oh_b[mb], ((2,), (1,)),
                                 precision=_HIGHEST)
                else:
                    ctx = last2_f[:, mb, :].astype(i32) * a + last_i[:, mb, :]
                    c_iota = jax.lax.broadcasted_iota(i32, (1, a * a, 1), 1)
                    ctx_oh = (c_iota == ctx[:, None, :]).astype(f32)
                    row_b = bdot(lm_b, ctx_oh, ((2,), (1,)),
                                 precision=_HIGHEST)
                lm_rows_b.append(lm_alpha * row_b + lm_beta)      # [G,A,KP]
        hlm_banks = None
        if nlm:
            # neural rows per STATE bank: log_softmax(Wo h + bo), blank
            # and padded-vocab slots masked as in the narrow kernel
            hlm_banks = [hlm_s[:, mb * h_dim:(mb + 1) * h_dim, :]
                         for mb in range(nb)]                     # [G,H,KP]
            wo_b = jnp.broadcast_to(wo_ref[:, :][None], (g, a, h_dim))
            bo_col = nb_ref[3 * h_dim:3 * h_dim + a, 0:1]         # [A,1]
            blank_mask = jnp.where(
                jax.lax.broadcasted_iota(i32, (1, a, 1), 1) == blank,
                -1e30, 0.0)
            nrow_b = []
            for mb in range(nb):
                lgt = bdot(wo_b, hlm_banks[mb], ((2,), (1,)),
                           precision=_HIGHEST)                    # [G,A,KP]
                lgt = lgt + bo_col[None] + blank_mask
                shifted = lgt - jnp.max(lgt, axis=1, keepdims=True)
                lsm = shifted - jnp.log(
                    jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
                nrow_b.append(lm_alpha * lsm + lm_beta)
            lm_rows_b = (nrow_b if lm_rows_b is None else
                         [x + y for x, y in zip(lm_rows_b, nrow_b)])
        if lm_rows_b is not None:
            lm_row = jnp.stack(lm_rows_b, axis=2).reshape(gr, kp)

        # ---- mate detection: NB x NB bank blocks ----------------------
        ph1 = (h1 - last_i) * _H1_INV
        ph2 = (h2 - last_i) * _H2_INV
        has_parent = (plen > 0) & (total > NEG_INF / 2)
        hp_f = has_parent.astype(f32)
        match = [[((ph1[:, jb, :][:, :, None] == h1[:, mb, :][:, None, :])
                   & (ph2[:, jb, :][:, :, None] == h2[:, mb, :][:, None, :])
                   ).astype(f32) * hp_f[:, jb, :][:, :, None]
                  for mb in range(nb)] for jb in range(nb)]       # [G,Kj,Km]
        mate_pb_l, mate_tot_l, mate_last_l, has_mate_l = [], [], [], []
        for jb in range(nb):
            acc = None
            hm = None
            for mb in range(nb):
                mate_in = jnp.concatenate(
                    [pb[:, mb, :][:, None, :], total[:, mb, :][:, None, :],
                     last_f[:, mb, :][:, None, :]], axis=1)             # [G,3,Km]
                out = bdot(mate_in, match[jb][mb], ((2,), (2,)),
                           precision=_HIGHEST)                    # [G,3,Kj]
                acc = out if acc is None else acc + out
                s = jnp.sum(match[jb][mb], axis=2)                # [G,Kj]
                hm = s if hm is None else hm + s
            mate_pb_l.append(acc[:, 0, :])
            mate_tot_l.append(acc[:, 1, :])
            mate_last_l.append(acc[:, 2, :])
            has_mate_l.append(hm)
        mate_pb = jnp.stack(mate_pb_l, axis=1)                    # [G,NB,KP]
        mate_total = jnp.stack(mate_tot_l, axis=1)
        mate_last = jnp.stack(mate_last_l, axis=1)
        has_mate = jnp.stack(has_mate_l, axis=1) > 0
        base_mate = jnp.where(mate_last == last_f, mate_pb, mate_total)
        ext_from_mate = base_mate + lp_at                         # [G,NB,KP]
        if lm_row is not None:
            lmf = []
            for jb in range(nb):
                acc = None
                for mb in range(nb):
                    x = bdot(lm_rows_b[mb], match[jb][mb], ((2,), (2,)),
                             precision=_HIGHEST)                  # [G,A,Kj]
                    acc = x if acc is None else acc + x
                lmf.append(jnp.sum(oh_b[jb] * acc, axis=1))       # [G,Kj]
            ext_from_mate = ext_from_mate + jnp.stack(lmf, axis=1)
        thr2 = None
        if topk:
            thr2 = thr_ref[:, pl.ds(i, 1), :].reshape(g, kp)      # [G,KP]
        gate = has_mate
        if topk:
            gate = gate & (lp_at >= thr2[:, None, :])
        if prune_logp is not None:
            gate = gate & (lp_at >= prune_logp)
        ext_from_mate = jnp.where(gate, ext_from_mate, NEG_INF)

        # ---- candidate rows [GR, KP] ----------------------------------
        stay_pb = total + lp_blank                                # [G,NB,KP]
        stay_pnb = _lse2(jnp.where(plen > 0, pnb + lp_at, NEG_INF),
                         ext_from_mate)
        is_last_g = (onehot_last > 0) & (rep(plen) > 0)
        base = jnp.where(is_last_g, rep(pb), rep(total))
        ext = base + lp_row
        if lm_row is not None:
            ext = ext + lm_row
        if topk:
            ext = jnp.where(lp_row < bcast_g(thr2), NEG_INF, ext)
        if prune_logp is not None:
            ext = jnp.where(lp_row < prune_logp, NEG_INF, ext)
        ext = jnp.where(rep(plen) >= max_len, NEG_INF, ext)
        excl_b = []
        for mb in range(nb):
            acc = None
            for jb in range(nb):
                x = bdot(oh_b[jb], match[jb][mb], ((2,), (1,)))   # [G,A,Km]
                acc = x if acc is None else acc + x
            excl_b.append(acc)
        excl = jnp.stack(excl_b, axis=2).reshape(gr, kp)
        ext = jnp.where(excl > 0, NEG_INF, ext)
        is_blank_row = crow == blank
        stay_merged = _lse2(stay_pb, stay_pnb)                    # [G,NB,KP]
        cand = jnp.where(is_blank_row, rep(stay_merged), ext)
        cand = jnp.where(
            rep(jnp.broadcast_to(live_b, (g, nb, kp))), cand, NEG_INF)

        # ---- top-K: per-GROUP 8-ary threshold search (pack=1) ---------
        kcand = _ordered_key(cand)                                # [GR,KP]
        kc3 = kcand.reshape(g, r, kp)
        finite = cand > NEG_INF / 2
        fin3 = finite.reshape(g, r, kp)
        khi0 = jnp.max(jnp.max(kc3, axis=2), axis=1,
                       keepdims=True)                             # [G,1]
        khi0_b = jnp.broadcast_to(khi0, (g, kp))
        stay_rows = jnp.broadcast_to(
            jax.lax.broadcasted_iota(i32, (1, r, 1), 1) // nb == blank,
            (g, r, kp))
        stay_fin = fin3 & stay_rows
        n_stay = jnp.sum(jnp.sum(stay_fin.astype(f32), axis=2), axis=1,
                         keepdims=True)                           # [G,1]
        min_stay = jnp.min(jnp.min(
            jnp.where(stay_fin, kc3, khi0[:, :, None]), axis=2), axis=1,
            keepdims=True)                                        # [G,1]
        min_fin = jnp.min(jnp.min(
            jnp.where(fin3, kc3, khi0[:, :, None]), axis=2), axis=1,
            keepdims=True)
        kf = jnp.float32(k)
        lo = jnp.where(jnp.broadcast_to(n_stay >= kf, (g, kp)),
                       jnp.broadcast_to(min_stay, (g, kp)),
                       jnp.broadcast_to(min_fin, (g, kp))) - 1
        hi = khi0_b + 1
        n_edge = _BISECT_ARITY - 1
        edge_iota = jax.lax.broadcasted_iota(i32, (n_edge, 1, 1), 0) + 1
        for _ in range(_BISECT_ITERS):
            w = jnp.maximum(jax.lax.shift_right_arithmetic(hi, 3)
                            - jax.lax.shift_right_arithmetic(lo, 3), 1)
            e7 = lo[None] + w[None] * edge_iota                   # [7,G,KP]
            ge = jnp.stack(
                [jnp.sum((kc3 >= e7[j][:, None, :]).astype(f32), axis=1)
                 for j in range(n_edge)], axis=0)                 # [7,G,KP]
            cnt = jnp.broadcast_to(
                jnp.sum(ge, axis=2, keepdims=True), (n_edge, g, kp))
            ok = cnt >= kf
            lo = jnp.max(jnp.where(ok, e7, lo[None]), axis=0)
            hi = jnp.min(jnp.where(ok, hi[None], e7), axis=0)

        tf = (kcand >= bcast_g(hi)).astype(f32)
        mf = ((kcand >= bcast_g(lo)) & (kcand < bcast_g(hi))
              & finite).astype(f32)
        cum2 = jnp.dot(
            jnp.concatenate([tf.reshape(g, r, kp), mf.reshape(g, r, kp)],
                            axis=1).reshape(2 * gr, kp),
            tri_lane, preferred_element_type=f32)                 # [2GR,KP]
        tot2 = jnp.dot(cum2, m_last, preferred_element_type=f32)
        cum23 = cum2.reshape(g, 2 * r, kp)
        tot23 = tot2.reshape(g, 2 * r, kp)
        m_cum = cum23[:, r:, :].reshape(gr, kp)
        t_tot = tot23[:, :r, :].reshape(gr, kp)
        m_tot = tot23[:, r:, :].reshape(gr, kp)
        off2 = jax.lax.dot_general(
            tri_row_strict, jnp.concatenate([t_tot, m_tot], axis=1),
            (((0,), (0,)), ((), ())), preferred_element_type=f32) # [GR,2KP]
        t_off, m_off = off2[:, :kp], off2[:, kp:]
        n_top = (t_off.reshape(g, r, kp)[:, r - 1, :]
                 + t_tot.reshape(g, r, kp)[:, r - 1, :])          # [G,KP]
        m_rank = m_off + m_cum
        msel = mf * (m_rank <= bcast_g(kf - n_top)).astype(f32)
        sf = tf + msel                                            # [GR,KP]
        cum_s = jnp.dot(sf, tri_lane, preferred_element_type=f32)
        tot_s = jnp.dot(cum_s, m_last, preferred_element_type=f32)
        off_s = jax.lax.dot_general(
            tri_row_strict, tot_s, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                           # [GR,KP]

        # ---- per-slot-bank compaction + state rebuild -----------------
        active_l = t < len_vec                                    # [G,KP]
        slot_f = lane2.astype(f32)                                # [1,KP]
        crow_f = crow.astype(f32)
        brow_f = brow.astype(f32)
        cand3 = cand.reshape(g, r, kp)
        cs3 = cum_s.reshape(g, r, kp)
        sf3 = sf.reshape(g, r, kp)
        nb_pb, nb_pnb, nb_plen = [], [], []
        nb_last, nb_last2, nb_h1, nb_h2 = [], [], [], []
        nb_hlm = []
        if nlm:
            # loop-invariant GRU weight broadcasts, hoisted out of the
            # per-slot-bank loop (mirrors the narrow kernel's layout)
            embt_b = jnp.broadcast_to(embt_ref[:, :][None], (g, e_dim, a))
            wx_b = jnp.broadcast_to(wx_ref[:, :][None],
                                    (g, 3 * h_dim, e_dim))
            wh_zr = jnp.broadcast_to(wh_ref[0:2 * h_dim, :][None],
                                     (g, 2 * h_dim, h_dim))
            wh_c = jnp.broadcast_to(wh_ref[2 * h_dim:, :][None],
                                    (g, h_dim, h_dim))
            b_zr = nb_ref[0:2 * h_dim, 0:1]                   # [2H,1]
            b_h = nb_ref[2 * h_dim:3 * h_dim, 0:1]
        for sb in range(nb):
            gslot = slot_f + sb * kp                              # [1,KP] f32
            gslot_i = jnp.broadcast_to(lane2 + sb * kp, (g, kp))
            c_sel = ((gslot >= off_s) & (gslot < off_s + tot_s)
                     ).astype(f32)                                # [GR,KP]
            c3 = c_sel.reshape(g, r, kp)
            n_csum = jnp.sum(c3, axis=1)                          # [G,KP]
            live_slot = (n_csum > 0) & (gslot_i < k)
            char_slot = jnp.sum((c_sel * crow_f).reshape(g, r, kp), axis=1)
            pbank = jnp.sum((c_sel * brow_f).reshape(g, r, kp), axis=1)
            base_s = jnp.sum((c_sel * off_s).reshape(g, r, kp), axis=1)
            rank_s = (jnp.broadcast_to(gslot, (g, kp)) - base_s)[:, :, None]
            gs = bdot(c3, jnp.concatenate([cs3, sf3], axis=2),
                      ((1,), (1,)))                               # [G,KP,2KP]
            cand_g = bdot(c3, cand3, ((1,), (1,)),
                          precision=_HIGHEST)                     # [G,KP,KP]
            rc_sel = gs[:, :, :kp]
            mm_sel = gs[:, :, kp:]
            oh3 = mm_sel * (rc_sel - 1.0 == rank_s).astype(f32)
            cand_val = jnp.sum(oh3 * cand_g, axis=2)              # [G,KP]
            pick_hi = None
            pick_lo = None
            oh3_obs = []
            for ob in range(nb):
                is_ob = jnp.sum(
                    (c_sel * (brow == ob).astype(f32)).reshape(g, r, kp),
                    axis=1)                                       # [G,KPs]
                oh3_ob = oh3 * is_ob[:, :, None]
                oh3_obs.append(oh3_ob)
                hi_stack = jnp.concatenate(
                    [stay_pb[:, ob, :][:, None, :], stay_pnb[:, ob, :][:, None, :],
                     plen[:, ob, :][:, None, :]], axis=1)               # [G,3,KPo]
                ho = bdot(hi_stack, oh3_ob, ((2,), (2,)),
                          precision=_HIGHEST)
                lo_stack = jnp.concatenate(
                    [last_f[:, ob, :][:, None, :], last2_f[:, ob, :][:, None, :],
                     jnp.broadcast_to(slot_f[None], (g, 1, kp))]
                    + bytes_of(h1[:, ob, :]) + bytes_of(h2[:, ob, :]),
                    axis=1)                                       # [G,11,KPo]
                lo_out = bdot(lo_stack, oh3_ob, ((2,), (2,)))
                pick_hi = ho if pick_hi is None else pick_hi + ho
                pick_lo = lo_out if pick_lo is None else pick_lo + lo_out
            p_stay_pb, p_stay_pnb = pick_hi[:, 0, :], pick_hi[:, 1, :]
            p_plen = pick_hi[:, 2, :]
            p_last, p_last2 = pick_lo[:, 0, :], pick_lo[:, 1, :]
            parent_slot = pick_lo[:, 2, :] + pbank * kp           # [G,KP] f32
            p_h1 = unbytes(pick_lo[:, 3:7, :])
            p_h2 = unbytes(pick_lo[:, 7:11, :])

            sel_is_stay = char_slot == float(blank)
            n_pb = jnp.where(live_slot & sel_is_stay, p_stay_pb, NEG_INF)
            n_pnb = jnp.where(live_slot,
                              jnp.where(sel_is_stay, p_stay_pnb, cand_val),
                              NEG_INF)
            extend = live_slot & ~sel_is_stay
            echar = jnp.where(extend, char_slot, 0.0)
            n_plen = p_plen + extend.astype(f32)
            n_last = jnp.where(extend, char_slot, p_last)
            n_last2 = jnp.where(extend, p_last, p_last2)
            ec_i = echar.astype(i32)
            n_h1 = jnp.where(extend, p_h1 * _H1_MULT + ec_i, p_h1)
            n_h2 = jnp.where(extend, p_h2 * _H2_MULT + ec_i, p_h2)
            n_h1 = jnp.where(live_slot, n_h1, gslot_i + 1)
            n_h2 = jnp.where(live_slot, n_h2, gslot_i + 1)

            packed = (parent_slot.astype(i32)
                      + jnp.where(extend, (ec_i + 1) * 256, 0))
            bp_ref[:, pl.ds(i, 1), pl.ds(sb, 1), :] = jnp.where(
                active_l, packed, gslot_i)[:, None, None, :]

            # per-bank new state; stacked stores happen after the loop
            # (int-indexed ref stores would lower to scatter)
            nb_pb.append(jnp.where(active_l, n_pb, pb[:, sb, :]))
            nb_pnb.append(jnp.where(active_l, n_pnb, pnb[:, sb, :]))
            nb_plen.append(jnp.where(active_l, n_plen, plen[:, sb, :]))
            nb_last.append(jnp.where(active_l, n_last, last_f[:, sb, :]))
            nb_last2.append(jnp.where(active_l, n_last2,
                                      last2_f[:, sb, :]))
            nb_h1.append(jnp.where(active_l, n_h1, h1[:, sb, :]))
            nb_h2.append(jnp.where(active_l, n_h2, h2[:, sb, :]))

            if nlm:
                # GRU state rebuild across banks + advance on the
                # extension char (same math as the narrow kernel's
                # transposed-layout update)
                h_par = None
                for ob in range(nb):
                    hp_ = bdot(hlm_banks[ob], oh3_obs[ob], ((2,), (2,)),
                               precision=_HIGHEST)                # [G,H,KPs]
                    h_par = hp_ if h_par is None else h_par + hp_
                aoh = (jax.lax.broadcasted_iota(i32, (1, a, 1), 1)
                       == ec_i[:, None, :]).astype(f32)           # [G,A,KP]
                x_t = bdot(embt_b, aoh, ((2,), (1,)),
                           precision=_HIGHEST)                    # [G,E,KP]
                xg = bdot(wx_b, x_t, ((2,), (1,)),
                          precision=_HIGHEST)                     # [G,3H,KP]
                hg = bdot(wh_zr, h_par, ((2,), (1,)),
                          precision=_HIGHEST)                     # [G,2H,KP]
                zr = jax.nn.sigmoid(xg[:, :2 * h_dim, :] + hg + b_zr[None])
                z_g, r_g = zr[:, :h_dim, :], zr[:, h_dim:, :]
                cg = bdot(wh_c, r_g * h_par, ((2,), (1,)),
                          precision=_HIGHEST)                     # [G,H,KP]
                cand_h = jnp.tanh(xg[:, 2 * h_dim:, :] + cg + b_h[None])
                h_new = (1.0 - z_g) * h_par + z_g * cand_h
                h_next = jnp.where(extend[:, None, :], h_new, h_par)
                nb_hlm.append(jnp.where(active_l[:, None, :], h_next,
                                        hlm_banks[sb]))

        def stack_b(lst):
            return jnp.concatenate([x[:, None, :] for x in lst], axis=1)

        pb_s[:, :, :] = stack_b(nb_pb)
        pnb_s[:, :, :] = stack_b(nb_pnb)
        plen_s[:, :, :] = stack_b(nb_plen)
        last_s[:, :, :] = stack_b(nb_last)
        last2_s[:, :, :] = stack_b(nb_last2)
        h1_s[:, :, :] = stack_b(nb_h1)
        h2_s[:, :, :] = stack_b(nb_h2)
        if nlm:
            hlm_s[:, :, :] = jnp.concatenate(nb_hlm, axis=1)

    def body(i, _):
        active_any = ti * tc + i < len_max

        @pl.when(active_any)
        def _():
            frame(i)

        @pl.when(jnp.logical_not(active_any))
        def _():
            for sb in range(nb):
                bp_ref[:, pl.ds(i, 1), pl.ds(sb, 1), :] = jnp.broadcast_to(
                    lane2 + sb * kp, (g, kp))[:, None, None, :]

        return 0

    jax.lax.fori_loop(0, tc, body, 0)

    @pl.when(ti == ntp - 1)
    def _():
        fin_ref[:, :, :, :] = jnp.concatenate([
            pb_s[:, :, :][:, None], pnb_s[:, :, :][:, None],
            plen_s[:, :, :][:, None],
            jnp.zeros((g, 5, nb, _LANE), jnp.float32)], axis=1)


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
    "prune_logp", "char_topk", "return_beams"))
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
                       char_topk: int = 0,
                       nlm_params=None,
                       return_beams: bool = False):
    """Batched exact prefix beam search, fully fused.

    Same contract as :func:`tpu_ctc.decode.beam.prefix_beam_search`
    (returns hyps [B, max_len], lengths [B], scores [B]); same math, one
    kernel program per block of 16 sublane-batched 128//K-utterance
    lane-groups instead of T compiled frames per utterance.

    ``char_topk`` caveat (the one non-bit-exact corner): admission is by
    THRESHOLD (log-prob >= the C-th largest), so when several chars tie
    EXACTLY at the admission bar the kernel admits all of them while the
    XLA path's ``top_k`` keeps the C lowest-indexed.  Both are valid
    top-C pruning; they only differ on bit-identical log-probs at
    exactly the C-th rank (possible on untrained/saturated posteriors,
    never observed on trained models).  All other knobs — any K <= 256,
    LMs, prune_logp, ties at the BEAM boundary — are bit-exact.
    """
    b, t_total, a_in = log_probs.shape
    k = beam_width
    if not supported(k, a_in, lm_order, nlm_params=nlm_params,
                     char_topk=char_topk):
        raise ValueError("beam_search_pallas: unsupported configuration")
    pack = pack_factor(k)
    kq = _LANE // pack
    b_pad = -(-b // pack) * pack                  # pad batch to pack size
    lp = log_probs.astype(jnp.float32)
    lens = frame_lengths.astype(jnp.int32)
    # char_topk admission bar: C-th largest non-blank log-prob per frame
    # (computed on the UNPADDED vocab; the XLA path's sel_thresh)
    use_topk = bool(char_topk) and char_topk < a_in - 1
    thr = None
    if use_topk:
        lp_ext = jnp.where(jnp.arange(a_in)[None, None, :] == blank,
                           NEG_INF, lp)
        thr = jax.lax.top_k(lp_ext, char_topk)[0][..., -1]        # [B, T]
    if nlm_params is not None:
        nlm_params = _pad_nlm_params(
            nlm_params, _round8(int(nlm_params["embed"].shape[1])),
            _round8(int(nlm_params["bz"].shape[0])))
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
        if thr is not None:
            thr = jnp.pad(thr, ((0, b_pad - b), (0, 0)))
    groups = b_pad // pack

    # G groups per kernel program (sublane-batched; see _beam_kernel).
    # Cap G so the per-program lp + bp blocks (double-buffered) stay
    # well inside VMEM, then pad the group count to a multiple of G
    # (dead groups: 0 frames, frozen immediately).
    g_blk = groups
    tc = min(64, t_total)
    while g_blk > 1 and g_blk * (tc * a * _LANE * 4 + tc * _LANE * 4
                                 ) * 2 > 48 * 1024 * 1024:
        g_blk -= 1
    wide = k > _LANE
    nb_banks = -(-k // _LANE)
    # wide kernel: row tensors are NB x larger — halve the sublane batch
    g_blk = min(g_blk, 8 if wide else 16)
    n_blk = -(-groups // g_blk)
    g_pad = n_blk * g_blk
    t_pad = -(-t_total // tc) * tc
    nt = t_pad // tc

    # Pre-spread each packed utterance's [T, A] posteriors to its kq
    # lanes: the kernel reads frames as ready-made [G*A, KP] grids with
    # zero in-kernel relayout work (HBM cost: A*KP/(A*P) ~ kq x the raw
    # posteriors, ~130 us of streaming at the bench shape — noise next
    # to the per-frame op savings).
    lp_t = (lp.reshape(groups, pack, t_total, a).transpose(0, 2, 3, 1)
            .repeat(kq, axis=3))                       # [G, T, A, KP]
    lp_t = jnp.pad(lp_t, ((0, g_pad - groups), (0, t_pad - t_total),
                          (0, 0), (0, 0)))
    len_tile = jnp.repeat(lens.reshape(groups, pack), kq,
                          axis=1)                      # [G, KP]
    len_tile = jnp.pad(len_tile, ((0, g_pad - groups), (0, 0)))
    if use_topk:
        # per-frame admission bar, lane-spread like the posteriors
        thr_t = (thr.reshape(groups, pack, t_total).transpose(0, 2, 1)
                 .repeat(kq, axis=2))                  # [G, T, KP]
        thr_t = jnp.pad(thr_t, ((0, g_pad - groups), (0, t_pad - t_total),
                                (0, 0)))
        thr_spec = pl.BlockSpec((g_blk, tc, _LANE), lambda i, t: (i, t, 0),
                                memory_space=pltpu.VMEM)
    else:
        thr_t = jnp.zeros((g_pad, 1, _LANE), jnp.float32)   # never read
        thr_spec = pl.BlockSpec((g_blk, 1, _LANE), lambda i, t: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    if lm_table is None or lm_order == 0:
        lm_in = jnp.zeros((a, 1), jnp.float32)
        rows = 1
    else:
        # tableT [A, ctx_rows]: lm_row = tableT @ ctx_onehot in-kernel
        lm_in = lm_table.astype(jnp.float32).reshape(-1, a).T     # [A, ctx]
        rows = lm_in.shape[1]

    f32 = jnp.float32
    if nlm_params is not None:
        # transposed GRU weights (kernel docstring); vocab padding: dead
        # embed rows (never selected) and NEG_INF bo slots (softmax-dead)
        emb = nlm_params["embed"].astype(f32)                     # [V, E]
        e_dim, h_dim = emb.shape[1], nlm_params["bz"].shape[0]
        embt = jnp.pad(emb, ((0, a - a_in), (0, 0))).T            # [E, A]
        wz, wr, wh_ = (nlm_params[n].astype(f32)
                       for n in ("wz", "wr", "wh"))               # [E+H, H]
        wx_in = jnp.concatenate(
            [wz[:e_dim].T, wr[:e_dim].T, wh_[:e_dim].T], axis=0)  # [3H, E]
        wh_in = jnp.concatenate(
            [wz[e_dim:].T, wr[e_dim:].T, wh_[e_dim:].T], axis=0)  # [3H, H]
        wo_in = jnp.pad(nlm_params["wo"].astype(f32),
                        ((0, 0), (0, a - a_in))).T                # [A, H]
        bo = jnp.pad(nlm_params["bo"].astype(f32), (0, a - a_in),
                     constant_values=NEG_INF)
        from tpu_ctc.decode.neural_lm import init_state as _nlm_init
        h_bos = _nlm_init(nlm_params).astype(f32)         # [H] BOS-stepped
        nb_in = jnp.concatenate(
            [nlm_params["bz"].astype(f32), nlm_params["br"].astype(f32),
             nlm_params["bh"].astype(f32), bo, h_bos])[:, None]  # [3H+A+H,1]
    else:
        e_dim = h_dim = 8
        embt = jnp.zeros((e_dim, a), f32)
        wx_in = jnp.zeros((3 * h_dim, e_dim), f32)
        wh_in = jnp.zeros((3 * h_dim, h_dim), f32)
        wo_in = jnp.zeros((a, h_dim), f32)
        nb_in = jnp.zeros((3 * h_dim + a + h_dim, 1), f32)

    def shared(shape):
        return pl.BlockSpec(shape, lambda i, t: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if wide:
        kernel = functools.partial(
            _beam_kernel_wide, g=g_blk, k=k, a=a, nb=nb_banks, blank=blank,
            max_len=max_len,
            lm_order=lm_order if lm_table is not None else 0,
            lm_alpha=lm_alpha, lm_beta=lm_beta, prune_logp=prune_logp,
            topk=use_topk, nlm=nlm_params is not None, e_dim=e_dim,
            h_dim=h_dim)
        bp, fin = pl.pallas_call(
            kernel,
            grid=(n_blk, nt),
            in_specs=[
                pl.BlockSpec((g_blk, tc, a, _LANE),
                             lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_blk, _LANE), lambda i, t: (i, 0),
                             memory_space=pltpu.VMEM),
                thr_spec,
                shared((a, rows)),
                shared((e_dim, a)),
                shared((3 * h_dim, e_dim)),
                shared((3 * h_dim, h_dim)),
                shared((a, h_dim)),
                shared((3 * h_dim + a + h_dim, 1)),
            ],
            out_specs=[
                pl.BlockSpec((g_blk, tc, nb_banks, _LANE),
                             lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_blk, 8, nb_banks, _LANE),
                             lambda i, t: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g_pad, t_pad, nb_banks, _LANE),
                                     jnp.int32),
                jax.ShapeDtypeStruct((g_pad, 8, nb_banks, _LANE),
                                     jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((g_blk, nb_banks, _LANE),
                                       jnp.float32) for _ in range(5)]
            + [pltpu.VMEM((g_blk, nb_banks, _LANE), jnp.int32)
               for _ in range(2)]
            + [pltpu.VMEM((g_blk, nb_banks * h_dim, _LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret(),
        )(lp_t, len_tile, thr_t, lm_in, embt, wx_in, wh_in, wo_in, nb_in)
        # beam slot s = bank*128 + lane: row-major (bank, lane) reshape
        kq = nb_banks * _LANE
        bp = bp[:groups, :t_total].reshape(groups, t_total, kq)[:b]
        fin = fin[:groups].reshape(groups, 8, kq)[:b]
    else:
        kernel = functools.partial(
            _beam_kernel, g=g_blk, k=k, a=a, blank=blank, t_total=t_pad,
            max_len=max_len,
            lm_order=lm_order if lm_table is not None else 0,
            lm_alpha=lm_alpha, lm_beta=lm_beta, prune_logp=prune_logp,
            pack=pack, nlm=nlm_params is not None, e_dim=e_dim,
            h_dim=h_dim, topk=use_topk)
        bp, fin = pl.pallas_call(
            kernel,
            grid=(n_blk, nt),
            in_specs=[
                pl.BlockSpec((g_blk, tc, a, _LANE),
                             lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_blk, _LANE), lambda i, t: (i, 0),
                             memory_space=pltpu.VMEM),
                thr_spec,
                shared((a, rows)),
                shared((e_dim, a)),
                shared((3 * h_dim, e_dim)),
                shared((3 * h_dim, h_dim)),
                shared((a, h_dim)),
                shared((3 * h_dim + a + h_dim, 1)),
            ],
            out_specs=[
                pl.BlockSpec((g_blk, tc, _LANE), lambda i, t: (i, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_blk, 8, _LANE), lambda i, t: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g_pad, t_pad, _LANE), jnp.int32),
                jax.ShapeDtypeStruct((g_pad, 8, _LANE), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((g_blk, _LANE), jnp.float32)
                            for _ in range(5)]
            + [pltpu.VMEM((g_blk, _LANE), jnp.int32) for _ in range(2)]
            + [pltpu.VMEM((g_blk, h_dim, _LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret(),
        )(lp_t, len_tile, thr_t, lm_in, embt, wx_in, wh_in, wo_in, nb_in)

        # unpack lane-groups back to per-utterance [B, ...] tensors
        bp = (bp[:groups, :t_total].reshape(groups, t_total, pack, kq)
              .transpose(0, 2, 1, 3).reshape(b_pad, t_total, kq)[:b])
        fin = (fin[:groups].reshape(groups, 8, pack, kq)
               .transpose(0, 2, 1, 3).reshape(b_pad, 8, kq)[:b])
    pb, pnb, plen = fin[:, 0, :], fin[:, 1, :], fin[:, 2, :]      # [B,KQ]
    score = _lse2(pb, pnb)
    best = jnp.argmax(score, axis=1)
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    plen_best = jnp.take_along_axis(plen, best[:, None], axis=1)[:, 0]
    hyps, lens_out = _reconstruct(bp, best, plen_best, max_len)
    if return_beams:
        return hyps, lens_out, best_score, score[:, :k], plen[:, :k]
    return hyps, lens_out, best_score
