"""Neural character language model (Maas et al. NAACL'15 variant).

Reference (SURVEY.md C10): a neural char LM scored inside the beam search
alongside the n-gram LM.  TPU-native design: a small GRU over character
embeddings, trained in-framework with the same optax/jit machinery as the
acoustic model; during decoding every beam entry carries its GRU state
[K, H], advanced only when a prefix is extended — so LM scoring is one
dense matmul per frame over the beam, fully on device.

Host-side ``score_host`` (recompute-from-prefix) makes it plug-compatible
with :func:`tpu_ctc.decode.beam.prefix_beam_search_host` for parity tests.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BOS = 0  # context id before the first character (shares the blank id slot)


@dataclasses.dataclass
class CharRNNLMConfig:
    vocab_size: int = 29
    embed_dim: int = 64
    hidden_dim: int = 128


def init_params(key: jax.Array, cfg: CharRNNLMConfig) -> Dict:
    ke, kz, kr, kh, ko = jax.random.split(key, 5)
    h, e, v = cfg.hidden_dim, cfg.embed_dim, cfg.vocab_size
    s = 0.08

    def mat(k, m, n):
        return s * jax.random.normal(k, (m, n), jnp.float32)

    return {
        "embed": mat(ke, v, e),
        # GRU gates: inputs [e + h] -> h each
        "wz": mat(kz, e + h, h), "bz": jnp.zeros((h,)),
        "wr": mat(kr, e + h, h), "br": jnp.zeros((h,)),
        "wh": mat(kh, e + h, h), "bh": jnp.zeros((h,)),
        "wo": mat(ko, h, v), "bo": jnp.zeros((v,)),
    }


def gru_step(params: Dict, h: jnp.ndarray, x_ids: jnp.ndarray) -> jnp.ndarray:
    """One GRU step.  h: [..., H]; x_ids: [...] int32 char ids."""
    x = params["embed"][x_ids]                       # [..., E]
    xh = jnp.concatenate([x, h], axis=-1)
    z = jax.nn.sigmoid(xh @ params["wz"] + params["bz"])
    r = jax.nn.sigmoid(xh @ params["wr"] + params["br"])
    xh_r = jnp.concatenate([x, r * h], axis=-1)
    cand = jnp.tanh(xh_r @ params["wh"] + params["bh"])
    return (1.0 - z) * h + z * cand


def logits(params: Dict, h: jnp.ndarray) -> jnp.ndarray:
    return h @ params["wo"] + params["bo"]


def log_probs(params: Dict, h: jnp.ndarray, blank_id: int = 0) -> jnp.ndarray:
    """log P(next char | state), with the blank/BOS slot masked out."""
    lg = logits(params, h)
    mask = jnp.where(jnp.arange(lg.shape[-1]) == blank_id, -1e30, 0.0)
    return jax.nn.log_softmax(lg + mask, axis=-1)


def init_state(params: Dict, batch_shape=()) -> jnp.ndarray:
    """Decode-time initial state: ONE BOS step from zeros.

    Matches the training convention in :func:`sequence_nll`, where the
    first character is predicted from ``gru_step(0, BOS)`` — every beam
    therefore scores its first extension from a state the LM was
    actually trained on (previously decoders started from raw zeros,
    shifting every first-char score off-distribution)."""
    h = params["bz"].shape[0]
    h_bos = gru_step(params, jnp.zeros((h,), jnp.float32),
                     jnp.asarray(BOS, jnp.int32))
    return jnp.broadcast_to(h_bos, batch_shape + (h,))


def sequence_nll(params: Dict, seqs: jnp.ndarray, lengths: jnp.ndarray
                 ) -> jnp.ndarray:
    """Mean per-char NLL of [B, L] zero-padded char sequences."""
    b, l = seqs.shape
    # inputs: BOS, c1, ..., c_{L-1}; targets: c1..cL
    inputs = jnp.pad(seqs, ((0, 0), (1, 0)))[:, :l]

    def step(h, x):
        inp, tgt = x
        h = gru_step(params, h, inp)
        lp = log_probs(params, h)
        nll = -jnp.take_along_axis(lp, tgt[:, None], axis=1)[:, 0]
        return h, nll

    # raw-zero start: the scan's first input IS the BOS token, so the
    # first prediction is conditioned on gru_step(0, BOS) — the same
    # state decode paths now start from via init_state
    h0 = jnp.zeros((b, params["bz"].shape[0]), jnp.float32)
    _, nlls = jax.lax.scan(step, h0, (inputs.T, seqs.T))
    nlls = nlls.T                                    # [B, L]
    mask = (jnp.arange(l)[None, :] < lengths[:, None]).astype(jnp.float32)
    return jnp.sum(nlls * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def train_char_rnn_lm(label_seqs: List[np.ndarray], cfg: CharRNNLMConfig,
                      steps: int = 500, batch_size: int = 32,
                      lr: float = 3e-3, seed: int = 0,
                      max_len: int = 64) -> Tuple[Dict, float]:
    """Train the GRU char LM on label id sequences; returns (params, nll)."""
    import optax

    rng = np.random.RandomState(seed)
    padded = np.zeros((len(label_seqs), max_len), np.int32)
    lens = np.zeros(len(label_seqs), np.int32)
    for i, s in enumerate(label_seqs):
        s = np.asarray(s, np.int32)[:max_len]
        padded[i, :len(s)] = s
        lens[i] = len(s)

    params = init_params(jax.random.PRNGKey(seed), cfg)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, seqs, lengths):
        nll, grads = jax.value_and_grad(sequence_nll)(params, seqs, lengths)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, nll

    nll = 0.0
    for step in range(steps):
        idx = rng.randint(0, len(label_seqs), batch_size)
        params, opt_state, nll = update(
            params, opt_state, jnp.asarray(padded[idx]),
            jnp.asarray(lens[idx]))
    return params, float(nll)


def train_nlm_from_data(dataset, cfg) -> Optional[Dict]:
    """Convenience: train the decode-config GRU char LM from a dataset
    (the neural analogue of ``lm.train_char_lm_from_data``); returns the
    param pytree or None when ``cfg.decode.neural_lm`` is off."""
    if not getattr(cfg.decode, "neural_lm", False):
        return None
    from tpu_ctc.decode.lm import label_seqs_of
    nl_cfg = CharRNNLMConfig(vocab_size=cfg.model.vocab_size,
                             embed_dim=cfg.decode.neural_lm_embed,
                             hidden_dim=cfg.decode.neural_lm_hidden)
    params, nll = train_char_rnn_lm(label_seqs_of(dataset), nl_cfg,
                                    steps=cfg.decode.neural_lm_steps)
    return params


class CharRNNLMHost:
    """Host-side adapter exposing ``score_host`` like NGramCharLM."""

    def __init__(self, params: Dict):
        self.params = jax.tree.map(np.asarray, params)

    def score_host(self, history, c: int) -> float:
        params = jax.tree.map(jnp.asarray, self.params)
        h = init_state(params)
        for ch in history:
            h = gru_step(params, h, jnp.asarray(int(ch)))
        lp = log_probs(params, h)
        return float(lp[int(c)])
