"""SGD + Nesterov momentum with momentum ramp — optax re-design of sgd.py.

The reference's ``sgd.py`` (SURVEY.md C5) hand-rolled SGD with (Nesterov)
momentum, a momentum ramp-up schedule, and gradient clipping inside the
model code.  Here the same training dynamics are expressed as an optax
chain, so the update is a pure function inside the jit-compiled train step.
"""
from __future__ import annotations

import optax

from tpu_ctc.config import OptimConfig


def momentum_schedule(cfg: OptimConfig):
    """Momentum ramp: momentum_start → momentum over momentum_ramp_steps."""
    if cfg.momentum_ramp_steps <= 0:
        return lambda step: cfg.momentum
    return optax.linear_schedule(
        init_value=cfg.momentum_start,
        end_value=cfg.momentum,
        transition_steps=cfg.momentum_ramp_steps)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    parts = []
    if cfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.inject_hyperparams(
        lambda momentum: optax.trace(decay=momentum, nesterov=cfg.nesterov)
    )(momentum=momentum_schedule(cfg)))
    if cfg.lr_decay != 1.0 and cfg.lr_decay_steps > 0:
        lr = optax.exponential_decay(
            init_value=cfg.learning_rate,
            transition_steps=cfg.lr_decay_steps,
            decay_rate=cfg.lr_decay, staircase=True)
        parts.append(optax.scale_by_learning_rate(lr))
    else:
        parts.append(optax.scale(-cfg.learning_rate))
    return optax.chain(*parts)
