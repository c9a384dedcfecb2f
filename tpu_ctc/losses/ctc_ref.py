"""Log-space CTC forward-backward loss — pure-jnp reference implementation.

The reference implements this dynamic program twice: a pure-numpy teaching
version (``ctc/ctc.py``, SURVEY.md C1 / §3.2) using probability-space alpha
recursions with per-frame rescaling, and a Cython port (``ctc_fast/``, C3)
for speed.  The TPU-native design (BASELINE north_star) instead works in
**log space** (log-sum-exp recursions, no rescaling needed), is **batched**
over utterances with static padded shapes, and runs the sequential-in-time
recursion under ``lax.scan`` so the whole loss lives on device inside the
jit-compiled train step — no GPU→CPU→GPU round trip per utterance
(the reference's famous bottleneck, SURVEY.md §3.1).

The gradient comes from autodiff through the scan, which reproduces the
analytic CTC gradient (verified by finite differences in
``tests/test_ctc.py``, mirroring the reference's ``ctc/test_ctc.py`` C2).
A Pallas kernel with a custom VJP lives in ``tpu_ctc/ops/ctc_pallas.py``;
this module is its correctness oracle.

Conventions: blank id is 0 (SURVEY.md §3.4); inputs are **logits** (the loss
applies log-softmax internally) of shape [B, T, A]; labels [B, L] padded
with zeros; per-utterance lengths give the valid extents.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Finite "minus infinity": large enough to never win a max, small enough that
# exp(NEG_INF - x) underflows cleanly without producing NaN gradients the way
# true -inf does in logaddexp chains.
NEG_INF = -1e30


# Floor inside log(): keeps log-sum-exp finite (and its gradient zero, not
# NaN) when every incoming path is dead — exp-sums underflow to exactly 0.
_LOG_FLOOR = 1e-37


def _logaddexp3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable log(e^a + e^b + e^c) with finite sentinels."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
        + _LOG_FLOOR)
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def extend_labels(labels: jnp.ndarray, blank: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blank-augmented label sequence l' and skip-allowed mask.

    ``labels [B, L]`` → ``ext [B, S=2L+1]`` with ext[2i] = blank and
    ext[2i+1] = labels[i] (SURVEY.md §3.2: "build blank-augmented sequence
    l' of length S=2L+1").  ``allow_skip[s]`` is True where the alpha
    recursion may take the s-2 transition: l'[s] != blank and
    l'[s] != l'[s-2].
    """
    b, l = labels.shape
    s = 2 * l + 1
    ext = jnp.full((b, s), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    is_label = (jnp.arange(s) % 2 == 1)[None, :]
    prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    allow_skip = is_label & (ext != prev2)
    # s=1 has no s-2 predecessor.
    allow_skip = allow_skip & (jnp.arange(s) >= 2)[None, :]
    return ext, allow_skip


def ctc_loss(logits: jnp.ndarray,
             labels: jnp.ndarray,
             logit_lengths: jnp.ndarray,
             label_lengths: jnp.ndarray,
             blank: int = 0) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood.

    Args:
      logits: [B, T, A] unnormalized scores.
      labels: [B, L] label ids (no blanks), zero-padded.
      logit_lengths: [B] valid frames per utterance.
      label_lengths: [B] valid labels per utterance.
      blank: blank id (0 by convention).

    Returns:
      nll [B], float32.  Utterances where the CTC constraint T >= L (plus
      required blanks between repeats) is violated get a large finite loss.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return ctc_loss_from_log_probs(log_probs, labels, logit_lengths,
                                   label_lengths, blank)


def ctc_loss_from_log_probs(log_probs: jnp.ndarray,
                            labels: jnp.ndarray,
                            logit_lengths: jnp.ndarray,
                            label_lengths: jnp.ndarray,
                            blank: int = 0) -> jnp.ndarray:
    """CTC NLL given already-normalized per-frame log-probabilities [B, T, A]."""
    b, t, _ = log_probs.shape
    labels = labels.astype(jnp.int32)
    ext, allow_skip = extend_labels(labels, blank)           # [B, S]
    s = ext.shape[1]
    s_idx = jnp.arange(s)[None, :]
    # States beyond the true 2*label_len+1 lattice are dead.
    valid_state = s_idx < (2 * label_lengths[:, None] + 1)

    # alpha_0: state 0 (blank) and state 1 (first label) only.
    emit0 = jnp.take_along_axis(log_probs[:, 0, :], ext, axis=1)  # [B, S]
    init = jnp.where(s_idx == 0, emit0, NEG_INF)
    init = jnp.where((s_idx == 1) & (label_lengths[:, None] > 0),
                     emit0, init)
    init = jnp.where(valid_state, init, NEG_INF)

    def step(alpha, inputs):
        lp_t, t_i = inputs                                    # lp_t: [B, A]
        emit = jnp.take_along_axis(lp_t, ext, axis=1)         # [B, S]
        shift1 = jnp.pad(alpha, ((0, 0), (1, 0)),
                         constant_values=NEG_INF)[:, :s]
        shift2 = jnp.pad(alpha, ((0, 0), (2, 0)),
                         constant_values=NEG_INF)[:, :s]
        shift2 = jnp.where(allow_skip, shift2, NEG_INF)
        new = _logaddexp3(alpha, shift1, shift2) + emit
        new = jnp.where(valid_state, new, NEG_INF)
        # Frames past the utterance end leave alpha untouched.
        active = (t_i < logit_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    xs = (jnp.moveaxis(log_probs, 1, 0)[1:], jnp.arange(1, t))
    alpha_final, _ = jax.lax.scan(step, init, xs)
    # Handle T == 1 (scan over zero steps) uniformly.
    alpha_final = jnp.where(t > 1, alpha_final, init)

    # NLL = -log(alpha[S-1] + alpha[S-2]) at the true final states.
    last = 2 * label_lengths                                  # blank state index
    a_last = jnp.take_along_axis(alpha_final, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha_final, jnp.maximum(last - 1, 0)[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    m_safe = jnp.maximum(m, NEG_INF / 2)
    total = m_safe + jnp.log(jnp.exp(a_last - m_safe) + jnp.exp(a_prev - m_safe)
                             + _LOG_FLOOR)
    total = jnp.where(m > NEG_INF / 2, total, NEG_INF)
    # Infeasible alignments (T too short) yield NEG_INF; clamp to a large
    # finite loss so gradients stay finite.
    return jnp.minimum(-total, 1e9)


def ctc_alignment_posteriors(log_probs, labels, logit_lengths, label_lengths,
                             blank: int = 0):
    """Per-frame lattice occupancy gamma [B, T, A] (for diagnostics/tests).

    Computed as d(-NLL)/d(log_probs) via autodiff — mathematically the CTC
    state-occupancy posteriors — matching the reference's analytic gradient
    construction (SURVEY.md §3.2: "grad wrt softmax input: p - gamma").
    """
    def total_ll(lp):
        return -jnp.sum(ctc_loss_from_log_probs(
            lp, labels, logit_lengths, label_lengths, blank))
    return jax.grad(total_ll)(log_probs)


@functools.partial(jax.jit, static_argnames=("blank",))
def ctc_loss_mean(logits, labels, logit_lengths, label_lengths, blank: int = 0):
    """Batch-mean CTC loss (per utterance), the training objective."""
    nll = ctc_loss(logits, labels, logit_lengths, label_lengths, blank)
    return jnp.mean(nll)
