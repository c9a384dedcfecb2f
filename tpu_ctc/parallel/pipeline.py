"""Pipeline parallelism: GPipe-style staging of the BiRNN stack.

SURVEY.md §2.2 P3: "stage the 5-layer stack across chips for very deep/wide
configs — layer-to-stage mapping + microbatched ppermute of activations."

Design (SPMD-uniform under ``jax.shard_map``; the 'model' mesh axis carries
the stages when ``mesh.pipeline`` is on — TP and PP are alternative uses of
that axis):

  * The bidirectional layers are stacked into leading-axis-[num_bi] param
    arrays and sharded over 'model', so each stage holds a contiguous span
    of ``num_bi / S`` layers and applies them with a ``lax.scan`` over its
    local layer axis.
  * The (cheap) pre/post/output dense layers are replicated; every stage
    computes them but only stage 0 (pre) / stage S-1 (post+out) use the
    result — the SPMD-uniformity tax, negligible next to the BiRNN stack.
  * Schedule: the local batch splits into M microbatches; over S + M - 1
    ticks, stage s processes microbatch (tick - s) while ``ppermute``
    forwards activations to stage s+1.  Autodiff through the shard_map
    gives the reverse pipeline for the backward pass automatically.
  * Final logits are summed onto all stages with a psum over 'model'
    (only the last stage contributes), and the CTC loss runs replicated —
    logits are tiny next to hidden activations.

Equivalence with the single-device model is exact (same math, same order);
tested on the virtual CPU mesh in ``tests/test_pipeline.py``.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_ctc.config import Config, ModelConfig
from tpu_ctc.models import birnn
from tpu_ctc.parallel.mesh import AXIS_DATA, AXIS_MODEL


def stack_bi_params(params: Dict) -> Dict:
    """Stack the per-layer bi dicts into leading-axis arrays."""
    if not params["bi"]:
        raise ValueError("pipeline requires at least one bi layer")
    keys = params["bi"][0].keys()
    stacked = {k: jnp.stack([l[k] for l in params["bi"]], axis=0)
               for k in keys}
    out = dict(params)
    out["bi"] = stacked
    return out


def unstack_bi_params(params: Dict, num_bi: int) -> Dict:
    out = dict(params)
    out["bi"] = [{k: v[i] for k, v in params["bi"].items()}
                 for i in range(num_bi)]
    return out


def pp_param_specs(cfg: ModelConfig) -> Dict:
    """PartitionSpecs for the stacked tree: bi layers sharded over 'model'
    on the layer axis; everything else replicated."""
    def repl(d):
        return {k: P() for k in d}

    return {
        "pre": [{"w": P(), "b": P()} for _ in range(cfg.num_pre_layers)],
        "bi": {"w": P(AXIS_MODEL), "b": P(AXIS_MODEL),
               "wf": P(AXIS_MODEL), "wb": P(AXIS_MODEL)},
        "post": [{"w": P(), "b": P()} for _ in range(cfg.num_post_layers)],
        "out": {"w": P(), "b": P()},
    }


def _bi_span(stacked_bi: Dict, x, mask, cfg: ModelConfig):
    """Apply this stage's span of bi layers (scan over the local layer axis)."""
    def one_layer(x, layer):
        return birnn._bi_layer(x, layer, mask, cfg), None

    out, _ = jax.lax.scan(one_layer, x, stacked_bi)
    return out


def make_pp_loss_fn(cfg: Config, mesh):
    """Build loss_fn(stacked_params, batch) evaluated under shard_map."""
    from tpu_ctc.losses import ctc

    s = dict(mesh.shape)[AXIS_MODEL]
    m_micro = cfg.mesh.pipeline_microbatches
    mcfg = cfg.model
    if mcfg.num_bi_layers % s:
        raise ValueError(f"num_bi_layers {mcfg.num_bi_layers} not divisible "
                         f"by {s} pipeline stages")

    batch_specs = {
        "feats": P(AXIS_DATA), "frame_mask": P(AXIS_DATA),
        "frame_lengths": P(AXIS_DATA), "labels": P(AXIS_DATA),
        "label_lengths": P(AXIS_DATA), "weights": P(AXIS_DATA),
    }
    param_specs = pp_param_specs(mcfg)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(param_specs, batch_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def pp_loss(params, batch):
        stage = jax.lax.axis_index(AXIS_MODEL)
        feats = batch["feats"].astype(jnp.float32)
        mask = batch["frame_mask"]
        b_loc, t, _ = feats.shape
        if b_loc % m_micro:
            raise ValueError(f"local batch {b_loc} not divisible by "
                             f"{m_micro} microbatches")
        bm = b_loc // m_micro

        # pre layers (used on stage 0 only; replicated params, cheap)
        x0 = feats
        for layer in params["pre"]:
            x0 = birnn._dense(x0, layer, mcfg)
        h = x0.shape[-1]

        mb_x = x0.reshape(m_micro, bm, t, h)
        mb_mask = mask.reshape(m_micro, bm, t)

        logits_acc = jnp.zeros(
            (m_micro, bm, t, mcfg.vocab_size), jnp.float32)
        recv = jnp.zeros((bm, t, h), jnp.float32)
        perm = [(i, i + 1) for i in range(s - 1)]

        for tick in range(s + m_micro - 1):
            mb_idx = tick - stage                       # traced scalar
            active = (mb_idx >= 0) & (mb_idx < m_micro)
            safe_idx = jnp.clip(mb_idx, 0, m_micro - 1)
            inp = jnp.where(stage == 0,
                            mb_x[safe_idx],
                            recv)
            m_loc = mb_mask[safe_idx]
            out = _bi_span(params["bi"], inp, m_loc, mcfg)
            # last stage: post + output head on its finished microbatch
            y = out
            for layer in params["post"]:
                y = birnn._dense(y, layer, mcfg)
            logits_mb = birnn._dense(y, params["out"], mcfg, activate=False)
            is_last = stage == s - 1
            contrib = jnp.where(active & is_last, 1.0, 0.0)
            onehot = (jnp.arange(m_micro) == safe_idx).astype(jnp.float32)
            logits_acc = logits_acc + (onehot[:, None, None, None] * contrib
                                       * logits_mb[None])
            if s > 1:
                send = jnp.where(active, out, 0.0)
                recv = jax.lax.ppermute(send, AXIS_MODEL, perm)

        # only the last stage holds logits; share them with a psum
        logits = jax.lax.psum(
            logits_acc.reshape(b_loc, t, mcfg.vocab_size), AXIS_MODEL)

        nll = ctc.ctc_loss(logits, batch["labels"], batch["frame_lengths"],
                           batch["label_lengths"], impl=cfg.ctc_impl)
        w = batch["weights"]
        s_nll = jax.lax.psum(jnp.sum(nll * w), AXIS_DATA)
        s_w = jax.lax.psum(jnp.sum(w), AXIS_DATA)
        s_frames = jax.lax.psum(jnp.sum(batch["frame_lengths"] * w),
                                AXIS_DATA)
        denom = jnp.maximum(s_w, 1.0)
        loss = s_nll / denom
        metrics = {
            "loss": loss,
            "loss_per_frame": s_nll / jnp.maximum(s_frames, 1.0),
            "num_utts": s_w,
            "num_frames": jnp.maximum(s_frames, 1.0),
        }
        return loss, metrics

    return pp_loss, batch_specs, param_specs
