"""Pallas TPU kernel for the CTC forward-backward dynamic program.

Placeholder in this stage of the build (SURVEY.md §7.1 stage 8): the
dispatcher in :mod:`tpu_ctc.losses.ctc` falls back to the jnp scan when
:func:`supported` is False.  The kernel lands with its own grad tests and a
TFLOP/s benchmark against the jnp implementation.
"""
from __future__ import annotations


def supported() -> bool:
    return False


def ctc_loss_from_log_probs(log_probs, labels, logit_lengths, label_lengths,
                            blank: int = 0):
    raise NotImplementedError("Pallas CTC kernel not yet built; use impl='jnp'")
