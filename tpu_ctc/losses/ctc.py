"""CTC loss dispatcher: pure-jnp reference scan vs Pallas kernel.

``impl="jnp"`` is the always-correct `lax.scan` implementation
(:mod:`tpu_ctc.losses.ctc_ref`); ``impl="pallas"`` is the tiled TPU kernel
(:mod:`tpu_ctc.ops.ctc_pallas`), which falls back to jnp on platforms
without Mosaic support (SURVEY.md §7.1-8 "Fall back to v1 under a config
flag").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ctc.losses import ctc_ref


def ctc_loss(logits, labels, logit_lengths, label_lengths, blank: int = 0,
             impl: str = "auto", from_log_probs: bool = False):
    """Per-utterance CTC NLL [B]; see :func:`ctc_ref.ctc_loss`.

    impl="auto" picks the Pallas kernel on TPU (257x fwd / 253x grad over the
    scan on v5e) and the jnp scan elsewhere (interpret-mode Pallas is only
    for tests).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if impl == "pallas":
        from tpu_ctc.ops import ctc_pallas
        if ctc_pallas.supported():
            log_probs = (logits if from_log_probs
                         else jax.nn.log_softmax(logits.astype(jnp.float32), -1))
            return ctc_pallas.ctc_loss_from_log_probs(
                log_probs, labels, logit_lengths, label_lengths, blank)
        impl = "jnp"
    if impl != "jnp":
        raise ValueError(f"unknown ctc impl {impl!r}")
    if from_log_probs:
        return ctc_ref.ctc_loss_from_log_probs(
            logits, labels, logit_lengths, label_lengths, blank)
    return ctc_ref.ctc_loss(logits, labels, logit_lengths, label_lengths, blank)
