"""shard_map tensor parallelism that keeps the fused Pallas recurrence.

SURVEY.md §2.2 P2 / §7.3-3 and BASELINE config 5 ("Wide BiRNN,
model-sharded").  The GSPMD route cannot partition the Pallas BiRNN
custom call, so a plain-jit TP train step had to fall back to the
latency-bound XLA scan (round-1 limitation).  This module runs the WHOLE
loss inside one ``jax.shard_map`` over ('data', 'model') with manual
collectives, so the fused kernel runs per device:

  layout invariant: activations between layers are H-sharded
  [T, B_local, H/n] over 'model' (B_local = B / n_data).

  * ``pre[0]`` — column-parallel [D, H/n]: replicated feats in,
    H-sharded out, no collective.
  * other dense layers — row-parallel [H/n, H]: partial [T, B, H] →
    ``psum_scatter`` over H → H-sharded again.  One reduce-scatter per
    layer, the minimal-bytes choice (1/n of a psum).
  * bi layer — row-parallel input projection, but the partials
    ``psum_scatter`` over the BATCH dim: each model-shard gets
    [T, B/n, H] — full hidden width for a slice of utterances — and runs
    the fused Pallas recurrence on it.  The intrinsically sequential
    work is thereby DIVIDED by n (the round-1 GSPMD design replicated
    it), and wf/wb stay replicated whole, exactly what the kernel needs
    in VMEM.  An ``all_to_all`` (batch-shard → H-shard) restores the
    invariant afterwards; same bytes on the wire as one activation
    tensor.
  * ``out`` — row-parallel [H/n, V], partials ``psum_scatter`` over
    batch → logits [T, B/n, V]; the CTC loss then runs batch-sharded
    over BOTH mesh axes (the 'model' axis moonlights as extra data
    parallelism for the loss), with labels sliced to matching rows.

Gradients: shard_map's transpose turns the reduce-scatters into
all-gathers and psums the cotangents of replicated params (wf/wb,
biases) over both axes — the manual-mode equivalent of the GSPMD
gradient allreduce (SURVEY.md §2.2 P8).

Requirements (validated): hidden_dim % n_model == 0,
(batch/n_data) % n_model == 0, num_pre_layers >= 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_ctc.config import Config
from tpu_ctc.losses import ctc
from tpu_ctc.models import birnn
from tpu_ctc.parallel.mesh import AXIS_DATA, AXIS_MODEL

LOSS_AXES = (AXIS_DATA, AXIS_MODEL)


def validate_tp(cfg: Config, mesh: Mesh) -> None:
    shape = dict(mesh.shape)
    n = shape.get(AXIS_MODEL, 1)
    nd = shape.get(AXIS_DATA, 1)
    if cfg.model.hidden_dim % n:
        raise ValueError(
            f"tensor parallelism requires hidden_dim % model axis == 0 "
            f"(hidden_dim={cfg.model.hidden_dim}, model={n})")
    local_b = cfg.data.batch_size // max(nd, 1)
    if cfg.data.batch_size % max(nd, 1) or local_b % n:
        raise ValueError(
            f"tensor parallelism requires (batch_size / data axis) divisible "
            f"by the model axis (batch={cfg.data.batch_size}, data={nd}, "
            f"model={n})")
    if cfg.model.num_pre_layers < 1:
        raise ValueError(
            "the shard_map TP path needs num_pre_layers >= 1 (the first "
            "dense layer is the column-parallel entry; a recurrent first "
            "layer would shard the feature dim instead)")


def _dense_col(x, layer, cfg, activate=True):
    """Column-parallel dense: replicated x, [D, H/n] shard -> [.., H/n]."""
    return birnn._dense(x, layer, cfg, activate=activate)


def _dense_row(x, layer, cfg, scatter_dim, activate=True):
    """Row-parallel dense: H-sharded x, [H/n, H] shard.

    Partial [T, B, H] products are reduce-scattered over 'model' along
    ``scatter_dim`` (2 = back to H-sharded, 1 = batch-sharded full-H).
    The bias is H-sharded for scatter_dim=2 and full for scatter_dim=1,
    matching :func:`birnn.param_partition_specs`.
    """
    cdt = jnp.dtype(cfg.compute_dtype)
    partial = birnn._dot(x, layer["w"], cdt)
    y = jax.lax.psum_scatter(partial, AXIS_MODEL,
                             scatter_dimension=scatter_dim, tiled=True)
    y = y + layer["b"].astype(jnp.float32)
    return birnn.clipped_relu(y, cfg.relu_clip) if activate else y


def tp_forward(params, cfg: Config, feats, frame_mask):
    """Manual-TP forward inside shard_map: local feats [B, T, D] +
    mask [B, T] -> batch-sharded logits [B/n, T, V] plus the row slice
    (start, size) of the local batch those logits correspond to."""
    mcfg = cfg.model
    n = jax.lax.axis_size(AXIS_MODEL)
    mi = jax.lax.axis_index(AXIS_MODEL)
    b_local = feats.shape[0]
    rows = b_local // n

    x = jnp.moveaxis(feats.astype(jnp.float32), 1, 0)     # [T, B, D]
    for i, layer in enumerate(params["pre"]):
        x = (_dense_col(x, layer, mcfg) if i == 0
             else _dense_row(x, layer, mcfg, scatter_dim=2))
    mask_rows = jax.lax.dynamic_slice_in_dim(frame_mask, mi * rows, rows, 0)
    for layer in params["bi"]:
        # z partials reduce-scatter over BATCH: [T, B, H] -> [T, B/n, H].
        z = _dense_row(x, layer, mcfg, scatter_dim=1, activate=False)
        hs = birnn.bi_recur_tm(z, layer["wf"], layer["wb"], mask_rows, mcfg)
        # batch-shard -> H-shard for the next layer: [T, B/n, H] -> [T, B, H/n]
        x = jax.lax.all_to_all(hs, AXIS_MODEL, split_axis=2, concat_axis=1,
                               tiled=True)
    for layer in params["post"]:
        x = _dense_row(x, layer, mcfg, scatter_dim=2)
    logits = _dense_row(x, params["out"], mcfg, scatter_dim=1, activate=False)
    return jnp.moveaxis(logits, 0, 1), mi * rows, rows    # [B/n, T, V]


def make_tp_loss_fn(cfg: Config, mesh: Mesh):
    """(params, batch) -> (loss, metrics) under shard_map over
    ('data', 'model'), fused-kernel-compatible (SURVEY P2)."""
    validate_tp(cfg, mesh)
    pspecs = birnn.param_partition_specs(cfg.model)

    def local_loss(params, batch):
        logits, start, rows = tp_forward(params, cfg, batch["feats"],
                                         batch["frame_mask"])

        def rows_of(x):
            return jax.lax.dynamic_slice_in_dim(x, start, rows, 0)

        labels = rows_of(batch["labels"])
        fl = rows_of(batch["frame_lengths"])
        ll = rows_of(batch["label_lengths"])
        w = rows_of(batch["weights"])
        nll = ctc.ctc_loss(logits, labels, fl, ll, impl=cfg.ctc_impl)

        def reduce(x):
            return jax.lax.psum(x, LOSS_AXES)

        num = reduce(jnp.sum(nll * w))
        utts = reduce(jnp.sum(w))
        frames = jnp.maximum(reduce(jnp.sum(fl * w)), 1.0)
        loss = num / jnp.maximum(utts, 1.0)
        metrics = {"loss": loss, "loss_per_frame": num / frames,
                   "num_utts": utts, "num_frames": frames}
        return loss, metrics

    batch_specs = {k: P(AXIS_DATA) for k in
                   ("feats", "frame_mask", "frame_lengths", "labels",
                    "label_lengths", "weights")}
    return jax.shard_map(local_loss, mesh=mesh,
                         in_specs=(pspecs, batch_specs),
                         out_specs=(P(), P()), check_vma=False)
