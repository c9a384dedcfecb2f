"""Deep bidirectional RNN acoustic model — TPU-native design.

Reference model family (SURVEY.md C4, ``ctc_fast/brnnet.py`` / ``rnn/*.py``):
a stack of affine + clipped-ReLU feed-forward layers with bidirectional
recurrent layers in the middle, hand-written backprop, Python loop over time
on gnumpy/cudamat.  Architecture faithful to Hannun et al. 2014: the
recurrent layer computes a shared input projection z_t = W x_t + b, then
forward and backward hidden sequences
    f_t = act(z_t + Wf f_{t-1}),   b_t = act(z_t + Wb b_{t+1}),
whose sum f_t + b_t is the layer output; act is the clipped ReLU
min(max(x, 0), clip).

TPU-native re-design (not a port):
  * Parameters are a plain pytree (nested dicts of jnp arrays); forward is a
    pure function — autodiff replaces the reference's hand-written backprop.
  * The input projection of every layer is one large batched matmul over
    [B*T, D] — MXU-shaped work, computed outside the recurrence.
  * Only the intrinsically sequential part (h_t from h_{t-1}) runs under
    ``lax.scan``; both directions share one scan via time-reversal.
  * Matmul inputs are cast to ``compute_dtype`` (bfloat16 by default) with
    float32 accumulation (``preferred_element_type``).
  * Optional ``jax.checkpoint`` (remat) per recurrent layer trades FLOPs for
    HBM, bounding activation memory on long utterances.
  * Tensor-parallel sharding: hidden dimension over the 'model' mesh axis
    (see :func:`param_partition_specs`); XLA inserts the collectives.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_ctc.config import ModelConfig
from tpu_ctc.parallel.mesh import AXIS_MODEL

Params = Dict[str, Any]


def clipped_relu(x: jnp.ndarray, clip: float) -> jnp.ndarray:
    """Reference-faithful activation: min(max(x, 0), clip) (SURVEY.md §7.1-4)."""
    return jnp.clip(x, 0.0, clip)


def _dense_init(key, fan_in: int, fan_out: int, scale: float, dtype):
    """Scaled-gaussian init of the reference era; bias zeros."""
    w = scale * jax.random.normal(key, (fan_in, fan_out), dtype=jnp.float32)
    return {"w": w.astype(dtype), "b": jnp.zeros((fan_out,), dtype=dtype)}


def _recur_init(key, hidden: int, scale: float, dtype):
    kf, kb = jax.random.split(key)
    return {
        "wf": (scale * jax.random.normal(kf, (hidden, hidden))).astype(dtype),
        "wb": (scale * jax.random.normal(kb, (hidden, hidden))).astype(dtype),
    }


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Initialize the full parameter pytree."""
    dtype = jnp.dtype(cfg.param_dtype)
    n_dense = cfg.num_pre_layers + cfg.num_bi_layers + cfg.num_post_layers
    keys = jax.random.split(key, n_dense + cfg.num_bi_layers + 1)
    ki = iter(range(len(keys)))

    params: Params = {"pre": [], "bi": [], "post": []}
    d = cfg.input_dim
    for _ in range(cfg.num_pre_layers):
        params["pre"].append(_dense_init(keys[next(ki)], d, cfg.hidden_dim,
                                         cfg.init_scale, dtype))
        d = cfg.hidden_dim
    for _ in range(cfg.num_bi_layers):
        layer = _dense_init(keys[next(ki)], d, cfg.hidden_dim,
                            cfg.init_scale, dtype)
        layer.update(_recur_init(keys[next(ki)], cfg.hidden_dim,
                                 cfg.init_scale, dtype))
        params["bi"].append(layer)
        d = cfg.hidden_dim
    for _ in range(cfg.num_post_layers):
        params["post"].append(_dense_init(keys[next(ki)], d, cfg.hidden_dim,
                                          cfg.init_scale, dtype))
        d = cfg.hidden_dim
    params["out"] = _dense_init(keys[next(ki)], d, cfg.vocab_size,
                                cfg.init_scale, dtype)
    return params


def _dot(x: jnp.ndarray, w: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Matmul with compute-dtype inputs and float32 accumulation (MXU)."""
    return jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def _dense(x, layer, cfg: ModelConfig, activate: bool = True) -> jnp.ndarray:
    cdt = jnp.dtype(cfg.compute_dtype)
    y = _dot(x, layer["w"], cdt) + layer["b"].astype(jnp.float32)
    return clipped_relu(y, cfg.relu_clip) if activate else y


def _recurrence_tm(z_t: jnp.ndarray, w: jnp.ndarray, m_t: jnp.ndarray,
                   reverse: bool, h0: jnp.ndarray, *, cfg: ModelConfig):
    """Time-major core: z_t [T, B, H], m_t [T, B, 1] -> (hs [T, B, H],
    h_last [B, H]) via ``lax.scan`` from carry h0."""
    cdt = jnp.dtype(cfg.compute_dtype)
    w_c = w.astype(cdt)                         # cast once, outside the scan

    def step(h_prev, inputs):
        z_i, m_i = inputs
        h_new = clipped_relu(
            z_i + jnp.dot(h_prev.astype(cdt), w_c,
                          preferred_element_type=jnp.float32),
            cfg.relu_clip)
        h_new = h_new * m_i
        return h_new, h_new

    h_last, hs = jax.lax.scan(step, h0, (z_t, m_t), reverse=reverse)
    return hs, h_last


def _recurrence_with_carry(z: jnp.ndarray, w: jnp.ndarray, mask: jnp.ndarray,
                           reverse: bool, h0: jnp.ndarray, *,
                           cfg: ModelConfig):
    """h_t = act(z_t + W h_{t-1}) along time via ``lax.scan``, from carry h0.

    Batch-major wrapper: z [B, T, H], mask [B, T].  Returns (hs [B, T, H],
    h_last [B, H]) where h_last is the state at the chunk boundary (last
    frame fwd / first frame bwd) — the carry a sequence-parallel neighbour
    chunk resumes from (SURVEY.md §2.2 P4).
    """
    if resolve_birnn_impl(cfg) == "pallas":
        from tpu_ctc.ops import birnn_pallas
        hs = birnn_pallas.carry_recurrence(
            z, w, h0, mask, reverse=reverse, clip=cfg.relu_clip,
            compute_dtype=cfg.compute_dtype,
            io_dtype=cfg.birnn_io_dtype or None)
        return hs, (hs[:, 0] if reverse else hs[:, -1])
    z_t = jnp.moveaxis(z, 1, 0)                 # [T, B, H]
    m_t = jnp.moveaxis(mask, 1, 0)[..., None]   # [T, B, 1]
    hs, h_last = _recurrence_tm(z_t, w, m_t, reverse, h0, cfg=cfg)
    return jnp.moveaxis(hs, 0, 1), h_last       # [B, T, H], [B, H]


def _recurrence(z: jnp.ndarray, w: jnp.ndarray, mask: jnp.ndarray,
                reverse: bool, *, cfg: ModelConfig) -> jnp.ndarray:
    """Zero-carry recurrence (single-chunk case).

    mask: [B, T] — at padded frames the state is held at zero, so the
    backward direction effectively starts at each utterance's true last
    frame (padding is trailing).
    """
    h0 = jnp.zeros((z.shape[0], z.shape[2]), dtype=jnp.float32)
    hs, _ = _recurrence_with_carry(z, w, mask, reverse, h0, cfg=cfg)
    return hs


def resolve_birnn_impl(cfg: ModelConfig) -> str:
    """Resolve cfg.birnn_impl: 'auto' picks the fused Pallas recurrence
    kernel on TPU (falling back to the XLA scan for widths whose weight
    matrix exceeds the VMEM budget) and the scan elsewhere."""
    impl = cfg.birnn_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    if impl == "pallas":
        from tpu_ctc.ops import birnn_pallas
        if not birnn_pallas.supported(cfg.hidden_dim, cfg.compute_dtype,
                                      cfg.birnn_io_dtype or None):
            impl = "scan"
    if impl not in ("scan", "pallas"):
        raise ValueError(f"unknown birnn impl {cfg.birnn_impl!r}")
    return impl


def _bi_layer(x, layer, mask, cfg: ModelConfig) -> jnp.ndarray:
    """Batch-major wrapper ([B, T, H] in/out) around :func:`_bi_layer_tm`."""
    x_t = jnp.moveaxis(x, 1, 0)
    return jnp.moveaxis(_bi_layer_tm(x_t, layer, mask, cfg), 0, 1)


def _bi_layer_tm(x_t, layer, mask, cfg: ModelConfig) -> jnp.ndarray:
    """Time-major recurrent layer: x_t [T, B, H], mask [B, T] -> [T, B, H].

    ``cfg.bidirectional=False`` runs the forward direction only — the
    reference's earlier-gen unidirectional family (rnn/rnnet.py)."""
    z = _dense(x_t, layer, cfg, activate=False)
    return bi_recur_tm(z, layer["wf"], layer["wb"], mask, cfg)


def bi_recur_tm(z, wf, wb, mask, cfg: ModelConfig) -> jnp.ndarray:
    """Recurrence-only core from a precomputed projection z [T, B, H]:
    f + b sweeps with impl dispatch (fused Pallas kernel or XLA scan).

    Factored out of :func:`_bi_layer_tm` so the shard_map tensor-parallel
    path (:mod:`tpu_ctc.parallel.tensor_parallel`) can feed it a
    reduce-scattered z while keeping the fused kernel per device.
    """
    if resolve_birnn_impl(cfg) == "pallas":
        from tpu_ctc.ops import birnn_pallas
        rec = functools.partial(birnn_pallas.bi_recurrence,
                                clip=cfg.relu_clip,
                                compute_dtype=cfg.compute_dtype,
                                io_dtype=cfg.birnn_io_dtype or None,
                                time_major=True,
                                bidirectional=cfg.bidirectional)
        if cfg.remat:
            rec = jax.checkpoint(rec)
        return rec(z, wf, wb, mask)
    m_t = jnp.moveaxis(mask, 1, 0)[..., None]
    h0 = jnp.zeros((z.shape[1], z.shape[2]), dtype=jnp.float32)

    def rec(z, w, m_t, reverse):
        return _recurrence_tm(z, w, m_t, reverse, h0, cfg=cfg)[0]

    if cfg.remat:
        rec = jax.checkpoint(rec, static_argnums=(3,))
    fwd = rec(z, wf, m_t, False)
    if not cfg.bidirectional:
        return fwd
    return fwd + rec(z, wb, m_t, True)


def forward(params: Params, cfg: ModelConfig, feats: jnp.ndarray,
            frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Acoustic model forward pass: [B, T, input_dim] → logits [B, T, vocab].

    Replaces the reference's ``costAndGrad`` forward (SURVEY.md §3.1) —
    but batched, static-shape, and fully on-device under jit.  Internally
    the stack runs TIME-MAJOR [T, B, H] — the layout both `lax.scan` and
    the fused Pallas recurrence want — with one cheap transpose of the
    small feats/logits tensors at each boundary, so no [B,T,H]-sized
    transposes appear anywhere in the step.
    """
    if frame_mask is None:
        frame_mask = jnp.ones(feats.shape[:2], dtype=jnp.float32)
    x = jnp.moveaxis(feats.astype(jnp.float32), 1, 0)   # [T, B, D]
    for layer in params["pre"]:
        x = _dense(x, layer, cfg)
    for layer in params["bi"]:
        x = _bi_layer_tm(x, layer, frame_mask, cfg)
    for layer in params["post"]:
        x = _dense(x, layer, cfg)
    logits = _dense(x, params["out"], cfg, activate=False)
    return jnp.moveaxis(logits, 0, 1)                   # [B, T, vocab]


def log_posteriors(params: Params, cfg: ModelConfig, feats, frame_mask=None):
    """Posterior-only forward for decoding (reference's decode-time entry)."""
    return jax.nn.log_softmax(forward(params, cfg, feats, frame_mask), axis=-1)


# ---------------------------------------------------------------------------
# Tensor-parallel partitioning (SURVEY.md §2.2 P2, BASELINE config 5).
# ---------------------------------------------------------------------------

def param_partition_specs(cfg: ModelConfig) -> Params:
    """PartitionSpec pytree matching :func:`init_params`'s structure.

    Layout chosen for the shard_map TP path
    (:mod:`tpu_ctc.parallel.tensor_parallel`), which keeps activations
    H-sharded between layers (SURVEY.md §7.3-3):

      * ``pre[0]``: column-parallel ([D, H/n]) — replicated feats in,
        H-sharded activations out, collective-free.
      * other dense layers: row-parallel ([H/n, H]) — consume H-sharded
        input, reduce-scatter the partial sums back to H-sharded.
      * ``bi[l].w``: row-parallel; its partials reduce-scatter over the
        BATCH so each model-shard runs the fused recurrence kernel on its
        own batch rows with the full hidden state (recurrence wall-clock
        scales 1/n instead of being replicated).
      * ``bi[l].wf/wb`` and biases feeding full-H tensors: replicated.

    The same specs drive GSPMD paths (eval/decode under TP): XLA inserts
    whatever collectives this layout needs there.
    """
    def col_spec():
        return {"w": P(None, AXIS_MODEL), "b": P(AXIS_MODEL)}

    def row_spec():
        return {"w": P(AXIS_MODEL, None), "b": P(AXIS_MODEL)}

    pre = [col_spec() if i == 0 else row_spec()
           for i in range(cfg.num_pre_layers)]
    specs: Params = {
        "pre": pre,
        "bi": [],
        "post": [row_spec() for _ in range(cfg.num_post_layers)],
        "out": {"w": P(AXIS_MODEL, None), "b": P(None)},
    }
    for _ in range(cfg.num_bi_layers):
        specs["bi"].append({
            "w": P(AXIS_MODEL, None), "b": P(None),
            "wf": P(None, None), "wb": P(None, None),
        })
    return specs


def count_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
