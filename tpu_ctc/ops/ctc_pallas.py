"""Pallas TPU kernel for the CTC forward-backward dynamic program.

BASELINE north_star: "the Python/Cython CTC loss becomes a Pallas log-space
DP kernel (log-space alpha/beta recursions tiled over the label lattice)".
Reference shape of the computation: SURVEY.md §3.2 — a T x S dynamic
program, sequential in t, parallel in s (S = 2L+1 blank-augmented states).

Design (division of labor with XLA):

  * The **kernels** implement only the intrinsically sequential recursions
    (alpha forward, beta backward) on [Bb, Tc, S_pad] VMEM tiles: per time
    step, two lane-rolls, a 3-way log-sum-exp, and an add — pure VPU work.
    The grid is (B/8, T/Tc); TPU grids execute sequentially, so the alpha
    (resp. beta) carry lives in VMEM scratch across time-chunks of the same
    batch block, and Pallas double-buffers the HBM<->VMEM tile DMAs.
    Per-frame activity (t < len, t == len-1, ...) is derived *inside* the
    kernel from per-row lengths (a static lane-0 load + the scalar time
    index) — Mosaic cannot do dynamic lane-dim loads, and shipping [B, T]
    mask tensors would waste bandwidth.

  * **XLA** handles everything embarrassingly parallel around them: the
    emission gather emit[b,t,s] = log_probs[b,t,ext[b,s]] with the
    state-validity mask folded in, the lattice masks (skip permission,
    initial/final states), the final log-sum-exp that turns frozen alphas
    into losses, and the gradient scatter gamma -> vocab classes (a
    take-along-axis transpose that autodiff turns into a segment-sum).

  * The gradient is a **custom VJP**: the backward pass runs the beta
    kernel, then d(-logP)/d(emit[t,s]) = -exp(alpha + beta + nll), and the
    chain rule through the emission gather / log-softmax is ordinary XLA
    autodiff.

State freezing makes variable lengths free: frames past a row's length
leave alpha untouched, so alpha_out[:, T-1, :] is each row's *final* alpha
regardless of its length, and the loss needs no per-row time gather.

Numerics match :mod:`tpu_ctc.losses.ctc_ref` (same finite NEG_INF
sentinels, same log-floor trick); parity is tested in
``tests/test_ctc_pallas.py`` against both the jnp scan and the torch oracle
fixtures.  On non-TPU backends the kernels run in Pallas interpret mode, so
the same code path is CI-testable on the virtual CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ctc.losses.ctc_ref import NEG_INF, extend_labels

_LOG_FLOOR = 1e-37


_VMEM_LIMIT = 110 * 1024 * 1024    # v5e has 128 MB; Mosaic defaults to 16


def _plan(b_pad: int, s: int):
    """(BB, TC): batch rows / time steps per grid block.  Wide batch blocks
    feed the 8x128 VPU many rows per loop iteration (1.9x over BB=8 on
    v5e); TC bounds the four double-buffered [BB, TC, S] tiles to ~24 MB
    of VMEM (the calls raise Mosaic's 16 MB scoped default)."""
    bb = next(x for x in (128, 64, 32, 16, 8) if b_pad % x == 0)
    tc = (24 * 1024 * 1024) // (4 * bb * s * 4)
    return bb, max(8, min(64, tc // 8 * 8))


def _pack_plan(s0: int, b: int) -> Tuple[int, int]:
    """(q, s_sub): utterances per 128-lane block and each one's lane
    width.  When 2L+1 << 128 the lattice wastes most of the VPU lane
    dim (SURVEY §7.3-1: "pack multiple utterances per lane block").

    Packing pays when the batch is large enough to be VPU-throughput
    bound: at B=32 the rows fit a couple of sublane blocks either way
    and the per-step recursion is latency-bound, so halving rows buys
    nothing (measured on v5e, device time, T=400/L=20: B=32 fwd
    0.07 ms both ways; B=128 packed 0.13 vs 0.21; B=256 0.28 vs 0.41 —
    see docs/PERF.md and `bench_ctc --force-q` for the table).  The
    emission einsum emits directly in the packed layout, so packing has
    no standalone transpose cost; the b/q >= 32 gate keeps the tiny
    latency-bound shapes on the simpler unpacked plan."""
    for s_sub in (16, 32, 64):
        if s0 <= s_sub and b // (128 // s_sub) >= 32:
            return 128 // s_sub, s_sub
    return 1, _round_up(max(s0, 128), 128)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported() -> bool:
    return True


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
                           + jnp.exp(c - m_safe) + _LOG_FLOOR)
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _shift_lanes(x, shift, s_sub):
    """x[..., s] <- x[..., s-shift] with NEG_INF fill (shift > 0),
    independently within each s_sub-lane sub-block (packed utterances:
    a roll crossing a sub-block boundary is masked dead)."""
    rolled = pltpu.roll(x, shift=shift, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % s_sub
    return jnp.where(lane >= shift, rolled, NEG_INF)


def _shift_lanes_neg(x, shift, s_sub):
    """x[..., s] <- x[..., s+shift] with NEG_INF fill (shift > 0),
    per s_sub-lane sub-block."""
    # pltpu.roll requires a non-negative shift; left-roll by k == roll by S-k.
    rolled = pltpu.roll(x, shift=x.shape[1] - shift, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % s_sub
    return jnp.where(lane < s_sub - shift, rolled, NEG_INF)


# ---------------------------------------------------------------------------
# Forward (alpha) kernel
# ---------------------------------------------------------------------------

def _alpha_kernel(emit_ref, skip_ref, init_ref, len_ref,
                  alpha_out_ref, alpha_scratch, *, s_sub: int):
    ti = pl.program_id(1)
    tc = emit_ref.shape[1]
    skip = skip_ref[:, :] > 0.0
    length = len_ref[:, :]            # [BB, S] f32, per-lane (packed utts)

    @pl.when(ti == 0)
    def _():
        alpha_scratch[:, :] = jnp.full_like(alpha_scratch[:, :], NEG_INF)

    def body(i, alpha):
        t = ti * tc + i
        emit_row = emit_ref[:, i, :]
        s1 = _shift_lanes(alpha, 1, s_sub)
        s2 = jnp.where(skip, _shift_lanes(alpha, 2, s_sub), NEG_INF)
        new = _lse3(alpha, s1, s2) + emit_row
        new = jnp.where(t == 0, init_ref[:, :] + emit_row, new)
        alpha = jnp.where(t < length, new, alpha)
        alpha_out_ref[:, i, :] = alpha
        return alpha

    alpha_scratch[:, :] = jax.lax.fori_loop(
        0, emit_ref.shape[1], body, alpha_scratch[:, :])


def _run_alpha(emit, skip, init, lengths, bb, tc, s_sub):
    """emit [B,T,S], skip/init/lengths [B,S] -> alpha_out [B,T,S]."""
    b, t, s = emit.shape
    grid = (b // bb, t // tc)
    return pl.pallas_call(
        functools.partial(_alpha_kernel, s_sub=s_sub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, tc, s), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, tc, s), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(emit, skip, init, lengths)


# ---------------------------------------------------------------------------
# Backward (beta) kernel
# ---------------------------------------------------------------------------

def _beta_kernel(emit_ref, skip2_ref, final_ref, len_ref,
                 beta_out_ref, be_scratch, *, s_sub: int):
    ti = pl.program_id(1)
    nt = pl.num_programs(1)
    skip2 = skip2_ref[:, :] > 0.0
    length = len_ref[:, :]            # [BB, S] f32, per-lane (packed utts)
    tc = emit_ref.shape[1]

    @pl.when(ti == 0)
    def _():
        be_scratch[:, :] = jnp.full_like(be_scratch[:, :], NEG_INF)

    def body(j, be_next):
        i = tc - 1 - j                            # reverse within the chunk
        t = (nt - 1 - ti) * tc + i                # global time (chunks reversed)
        emit_row = emit_ref[:, i, :]
        s1 = _shift_lanes_neg(be_next, 1, s_sub)
        s2 = jnp.where(skip2, _shift_lanes_neg(be_next, 2, s_sub), NEG_INF)
        new = _lse3(be_next, s1, s2)
        beta = jnp.where(t == length - 1, final_ref[:, :],
                         jnp.where(t < length - 1, new, NEG_INF))
        beta_out_ref[:, i, :] = beta
        return beta + emit_row

    be_scratch[:, :] = jax.lax.fori_loop(0, tc, body, be_scratch[:, :])


def _run_beta(emit, skip2, final, lengths, bb, tc, s_sub):
    b, t, s = emit.shape
    nt = t // tc
    grid = (b // bb, nt)
    rev = lambda bi, ti: (bi, nt - 1 - ti, 0)
    return pl.pallas_call(
        functools.partial(_beta_kernel, s_sub=s_sub),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, tc, s), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s), lambda bi, ti: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, tc, s), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, s), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(emit, skip2, final, lengths)


# ---------------------------------------------------------------------------
# custom-VJP DP on the emission lattice
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_ctc_dp(q: int, s_sub: int):
    """custom-VJP DP specialized to a lane-packing plan (q utterances of
    s_sub lattice lanes per 128-lane row)."""

    def _fwd(emit, skip, skip2, init, final, lengths):
        bb, tc = _plan(emit.shape[0], emit.shape[2])
        alpha = _run_alpha(emit, skip, init, lengths, bb, tc, s_sub)
        # Frozen final alpha + additive final-state mask -> per-utt log P
        # (the LSE runs per s_sub sub-block, not across packed utts).
        a_last = alpha[:, -1, :] + final
        rows = a_last.shape[0]
        al = a_last.reshape(rows, q, s_sub)
        m = jnp.max(al, axis=2)
        m_safe = jnp.maximum(m, NEG_INF / 2)
        logp = m_safe + jnp.log(
            jnp.sum(jnp.exp(al - m_safe[:, :, None]), axis=2) + _LOG_FLOOR)
        logp = jnp.where(m > NEG_INF / 2, logp, NEG_INF)
        nll = jnp.minimum(-logp, 1e9)                 # [rows, q]
        return nll, (emit, skip2, final, lengths, alpha, nll)

    def _bwd(res, g):
        emit, skip2, final, lengths, alpha, nll = res
        bb, tc = _plan(emit.shape[0], emit.shape[2])
        beta = _run_beta(emit, skip2, final, lengths, bb, tc, s_sub)
        # gamma[b,t,s] = exp(alpha + beta - logP); d nll/d emit = -gamma.
        nll_lanes = jnp.repeat(nll, s_sub, axis=1)    # [rows, S]
        log_gamma = alpha + beta + nll_lanes[:, None, :]
        gamma = jnp.where(log_gamma > NEG_INF / 2, jnp.exp(log_gamma), 0.0)
        # per-lane activity: packed utts in a row have different lengths
        active = (jnp.arange(alpha.shape[1])[None, :, None]
                  < lengths[:, None, :]).astype(gamma.dtype)
        gamma = gamma * active
        # Infeasible utts (clamped nll) carry no gradient.
        feasible = jnp.repeat(nll < 1e9, s_sub, axis=1)[:, None, :]
        g_lanes = jnp.repeat(g, s_sub, axis=1)[:, None, :]
        demit = jnp.where(feasible, -gamma * g_lanes, 0.0)
        z = lambda x: jnp.zeros_like(x)
        return (demit, z(skip2), z(skip2), z(final), z(final),
                jnp.zeros_like(lengths))

    @jax.custom_vjp
    def dp(emit, skip, skip2, init, final, lengths):
        nll, _ = _fwd(emit, skip, skip2, init, final, lengths)
        return nll

    dp.defvjp(_fwd, _bwd)
    return dp


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def ctc_loss_from_log_probs(log_probs: jnp.ndarray,
                            labels: jnp.ndarray,
                            logit_lengths: jnp.ndarray,
                            label_lengths: jnp.ndarray,
                            blank: int = 0,
                            force_q: Optional[int] = None) -> jnp.ndarray:
    """Per-utterance CTC NLL [B] — Pallas DP, same contract as
    :func:`tpu_ctc.losses.ctc_ref.ctc_loss_from_log_probs`.

    ``force_q`` overrides the lane-packing plan (benchmarking only):
    1 disables packing, q > 1 forces q utterances per 128-lane row.
    """
    b, t, a = log_probs.shape
    labels = labels.astype(jnp.int32)
    ext, allow_skip = extend_labels(labels, blank)            # [B, S0]
    s0 = ext.shape[1]
    q, s_sub = _pack_plan(s0, b)     # q utts per 128-lane row (SURVEY §7.3-1)
    if force_q is not None:
        if force_q == 1:
            q, s_sub = 1, _round_up(max(s0, 128), 128)
        else:
            if 128 % force_q:
                raise ValueError(
                    f"force_q={force_q} must divide 128: a non-divisor "
                    "yields a non-lane-aligned packing plan")
            q, s_sub = force_q, 128 // force_q
            if s0 > s_sub:
                raise ValueError(f"force_q={force_q} needs S0 <= {s_sub}")
    s = q * s_sub
    b_q = _round_up(b, q) // q       # lane-packed batch rows
    bb, tc = _plan(_round_up(b_q, 8), s)
    b_pad = _round_up(b_q, bb)
    t_pad = _round_up(t, tc)

    lengths = logit_lengths.astype(jnp.int32)
    lab_len = label_lengths.astype(jnp.int32)

    # Pack q utterances per 128-lane row.  Padded utts get length 0
    # (never active); padded lanes get NEG_INF state masks (dead).
    b_grp = b_q * q                  # batch rounded up to the pack factor

    def pack_bs(x, fill):            # [B, w <= s_sub] -> [b_pad, q*s_sub]
        w = x.shape[1]
        x = jnp.pad(x, ((0, b_grp - b), (0, s_sub - w)),
                    constant_values=fill)
        x = x.reshape(b_q, q * s_sub)
        return jnp.pad(x, ((0, b_pad - b_q), (0, 0)), constant_values=fill)

    # Emission lattice + validity folded in (invalid states stay dead).
    # The gather emit[b,t,s] = log_probs[b,t,ext[b,s]] is expressed as a
    # one-hot einsum: its transpose (the gradient scatter gamma -> vocab)
    # then lowers to an MXU matmul instead of a serialized scatter-add
    # (which dominated the backward pass: 22 ms -> ~6 ms at T=1600,L=120).
    # The einsum emits DIRECTLY in the packed [b_q, T, q*s_sub] layout
    # ("rjta,rjsa->rtjs" batched over (row, packed-utt); the trailing
    # (j, s) merge is a free reshape) — the r3 version packed with a
    # [B,T,S] transpose shuffle afterwards, which was the measured
    # packing overhead (VERDICT r3 #5).
    onehot = (ext[:, :, None] == jnp.arange(a)[None, None, :])  # [B, S0, A]
    # Finitize first: -inf * 0.0 in the einsum would turn masked-vocab
    # entries into NaN and poison every lattice state of that row.  The
    # NEG_INF sentinel is already "dead" to the kernel's log-sum-exps.
    finite_lp = jnp.maximum(log_probs.astype(jnp.float32), NEG_INF)
    oh_p = jnp.pad(onehot, ((0, b_grp - b), (0, s_sub - s0), (0, 0)))
    lp_p = jnp.pad(finite_lp, ((0, b_grp - b), (0, t_pad - t), (0, 0)))
    emit = jnp.einsum(
        "rjta,rjsa->rtjs",
        lp_p.reshape(b_q, q, t_pad, a),
        oh_p.reshape(b_q, q, s_sub, a).astype(jnp.float32),
        preferred_element_type=jnp.float32).reshape(b_q, t_pad, s)
    emit = jnp.pad(emit, ((0, b_pad - b_q), (0, 0), (0, 0)))
    sv_idx = jnp.arange(s_sub)[None, :]
    valid = sv_idx < (2 * lab_len[:, None] + 1)               # [B, s_sub]
    emit = emit + pack_bs(jnp.where(valid, 0.0, NEG_INF),
                          NEG_INF)[:, None, :]

    s_idx = jnp.arange(s0)[None, :]
    skip = allow_skip.astype(jnp.float32)                     # [B, S0]
    # beta's s -> s+2 jump permission: allow_skip evaluated at s+2.
    skip2 = jnp.pad(skip[:, 2:], ((0, 0), (0, 2)))
    init = jnp.where(s_idx == 0, 0.0, NEG_INF)
    init = jnp.where((s_idx == 1) & (lab_len[:, None] > 0), 0.0, init)
    last = 2 * lab_len[:, None]
    final = jnp.where((s_idx == last)
                      | ((s_idx == last - 1) & (lab_len[:, None] > 0)),
                      0.0, NEG_INF)
    # float32 so the custom-VJP cotangent is an ordinary zero array
    # (integer primals would need float0 cotangents); per-LANE lengths so
    # packed utts freeze independently.
    len_lanes = pack_bs(
        jnp.broadcast_to(lengths.astype(jnp.float32)[:, None], (b, s0)), 0.0)

    dp = _make_ctc_dp(q, s_sub)
    nll = dp(emit, pack_bs(skip, 0.0), pack_bs(skip2, 0.0),
             pack_bs(init, NEG_INF), pack_bs(final, NEG_INF), len_lanes)
    return nll.reshape(-1)[:b]


def ctc_loss(logits, labels, logit_lengths, label_lengths, blank: int = 0):
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return ctc_loss_from_log_probs(log_probs, labels, logit_lengths,
                                   label_lengths, blank)
