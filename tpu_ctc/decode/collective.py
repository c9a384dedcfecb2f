"""Collective batched decoding over the device mesh (SURVEY.md P7).

Reference analogue: per-utterance CPU beam search (SURVEY.md §3.3).  Here
the batched on-device beam search shards utterances over the 'data' mesh
axis, with TWO collective exchanges of decode state (BASELINE:
"beam-search hypothesis state is exchanged via collectives for batched
decode"):

  * **Length-balanced utterance redistribution** (``redistribute=True``):
    before the search, posteriors are re-dealt over the 'data' axis so
    every shard gets an equal SUM OF FRAME LENGTHS, not just an equal
    utterance count.  The fused Pallas search (ops/beam_pallas) skips
    padding frames, so its per-shard time is proportional to total real
    frames — an unbalanced batch makes every chip wait for the longest
    shard.  Assignment is a snake deal over length-sorted utterances
    (longest first, boustrophedon over shards: equal counts, near-equal
    loads); the exchange is a RING of ``ppermute`` steps — peak memory
    one extra local shard, traffic (n-1)/n of an all_gather, and every
    hop is ICI-neighbor traffic.  Hypotheses come back in dealt order and
    are restored by an inverse-permutation gather after the final
    all_gather.

  * **Final hypothesis all_gather**: outputs are requested replicated, so
    XLA inserts the all_gather that hands every host every hypothesis.

Why there is NO per-frame hypothesis exchange: see docs/PERF.md ("P7:
what is (and is not) exchanged during collective decode") — per-utterance
beams are fixed-shape and independent, so the only cross-shard quantity
that affects wall-clock is load balance, which the redistribution above
fixes at a one-off cost instead of a per-frame collective (T latencies on
the critical path).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ctc.config import Config
from tpu_ctc.decode.beam import prefix_beam_search
from tpu_ctc.decode.greedy import collapse_ids
from tpu_ctc.decode.lm import NGramCharLM
from tpu_ctc.models import birnn
from tpu_ctc.ops import beam_pallas
from tpu_ctc.parallel.mesh import AXIS_DATA


def snake_assignment(lengths: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Length-balancing permutation: perm[j] = original utterance id that
    decodes at dealt position j (positions [s*b, (s+1)*b) live on shard s).

    Sort by length descending, then deal boustrophedon (shard 0..n-1,
    n-1..0, ...): equal per-shard counts and near-equal per-shard total
    length (the longest-processing-time heuristic restricted to equal
    cardinality).
    """
    b_total = lengths.shape[0]
    if b_total % n_shards:
        # the scatter below collides for ragged batches and would
        # silently emit a non-permutation (ADVICE r3)
        raise ValueError(f"snake_assignment: batch {b_total} not divisible "
                         f"by {n_shards} shards")
    per = b_total // n_shards
    order = jnp.argsort(-lengths.astype(jnp.int32)).astype(jnp.int32)
    pos = jnp.arange(b_total)
    rnd, col = pos // n_shards, pos % n_shards
    shard = jnp.where(rnd % 2 == 0, col, n_shards - 1 - col)
    new_idx = shard * per + rnd
    return jnp.zeros((b_total,), jnp.int32).at[new_idx].set(order)


def _ring_redistribute(log_probs, frame_lengths, perm, axis_name, n_shards):
    """Re-deal (log_probs, frame_lengths) to the `perm` layout via a ring.

    Each of the n-1 steps ppermutes the ORIGINAL local shard one hop
    around the 'data' ring; each device folds the utterances assigned to
    it into its output buffer with a one-hot merge.  Peak memory: one
    extra [b, T, A] buffer; total traffic: (n-1) local shards.
    """
    me = jax.lax.axis_index(axis_name)
    b_loc = log_probs.shape[0]
    my_ids = jax.lax.dynamic_slice(perm, (me * b_loc,), (b_loc,))
    cur = log_probs
    cur_ids = me * b_loc + jnp.arange(b_loc, dtype=jnp.int32)
    cur_lens = frame_lengths.astype(jnp.float32)
    out = jnp.zeros_like(log_probs)
    out_lens = jnp.zeros((b_loc,), jnp.float32)
    ring = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    for k in range(n_shards):
        # one-hot merge; HIGHEST so the TPU MXU doesn't bf16-round the
        # payload posteriors (exact for 0/1 selection matrices)
        m = (my_ids[:, None] == cur_ids[None, :]).astype(jnp.float32)
        out = out + jnp.einsum("ji,ita->jta", m, cur,
                               precision=jax.lax.Precision.HIGHEST)
        out_lens = out_lens + jnp.einsum(
            "ji,i->j", m, cur_lens, precision=jax.lax.Precision.HIGHEST)
        if k < n_shards - 1:
            cur = jax.lax.ppermute(cur, axis_name, ring)
            cur_ids = jax.lax.ppermute(cur_ids, axis_name, ring)
            cur_lens = jax.lax.ppermute(cur_lens, axis_name, ring)
    return out, out_lens.astype(jnp.int32)


def make_collective_decoder(cfg: Config, mesh: Mesh,
                            lm: Optional[NGramCharLM] = None,
                            nlm_params=None, use_beam: bool = True,
                            max_len: int = 128,
                            redistribute: bool = True):
    """Build a jit'd (params, batch) -> (hyps, lens) decoder on the mesh.

    Inputs are consumed sharded over 'data'; outputs are produced
    replicated (the all_gather is XLA's), so every host sees every
    hypothesis — the multi-host decode contract.  With ``redistribute``
    (and >1 'data' shard, beam mode), utterances are length-rebalanced
    over the mesh before the search (see module docstring).
    """
    data = NamedSharding(mesh, P(AXIS_DATA))
    repl = NamedSharding(mesh, P())
    b_sh = {"feats": data, "frame_mask": data, "frame_lengths": data,
            "labels": data, "label_lengths": data, "weights": data}
    lm_table = lm.tables_device() if lm is not None else None
    lm_order = lm.order if lm is not None else 0
    n_data = dict(mesh.shape).get(AXIS_DATA, 1)
    use_kernel = (use_beam and getattr(cfg.decode, "use_fused_kernel", True)
                  and beam_pallas.supported(
                      cfg.decode.beam_width, cfg.model.vocab_size, lm_order,
                      nlm_params=nlm_params,
                      char_topk=cfg.decode.char_topk))
    do_redist = redistribute and use_beam and n_data > 1

    def search(log_probs, frame_lengths):
        if use_kernel:
            hyps, lens, _ = beam_pallas.beam_search_pallas(
                log_probs, frame_lengths,
                beam_width=cfg.decode.beam_width, max_len=max_len,
                lm_table=lm_table, lm_order=lm_order,
                lm_alpha=cfg.decode.lm_alpha, lm_beta=cfg.decode.lm_beta,
                prune_logp=cfg.decode.prune_logp,
                char_topk=cfg.decode.char_topk, nlm_params=nlm_params)
        else:
            hyps, lens, _ = prefix_beam_search(
                log_probs, frame_lengths,
                beam_width=cfg.decode.beam_width, max_len=max_len,
                lm_table=lm_table, lm_order=lm_order,
                lm_alpha=cfg.decode.lm_alpha, lm_beta=cfg.decode.lm_beta,
                char_topk=cfg.decode.char_topk,
                prune_logp=cfg.decode.prune_logp, nlm_params=nlm_params)
        return hyps, lens

    def decode(params, batch):
        log_probs = birnn.log_posteriors(params, cfg.model, batch["feats"],
                                         batch["frame_mask"])
        frame_lengths = batch["frame_lengths"]
        if use_beam:
            if do_redist:
                lens_g = jax.lax.all_gather(frame_lengths, AXIS_DATA,
                                            tiled=True)            # [B]
                perm = snake_assignment(lens_g, n_data)
                log_probs, frame_lengths = _ring_redistribute(
                    log_probs, frame_lengths, perm, AXIS_DATA, n_data)
            hyps, lens = search(log_probs, frame_lengths)
        else:
            ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            hyps, lens = collapse_ids(ids, batch["frame_mask"])
        return hyps, lens

    fn = decode
    if n_data > 1:
        # shard_map so the Pallas kernels (opaque to GSPMD) run
        # batch-sharded; the replicated out_shardings below then make XLA
        # all_gather each shard's hypotheses across the mesh.
        b_specs = {k: P(AXIS_DATA) for k in b_sh}
        fn = jax.shard_map(decode, mesh=mesh, in_specs=(P(), b_specs),
                           out_specs=P(AXIS_DATA), check_vma=False)

    if do_redist:
        inner = fn

        def restore(params, batch):
            # undo the dealt order after the (XLA-inserted) all_gather:
            # dealt position j holds original utterance perm[j]
            hyps, lens = inner(params, batch)
            perm = snake_assignment(batch["frame_lengths"], n_data)
            inv = jnp.argsort(perm)
            return hyps[inv], lens[inv]

        fn = restore

    return jax.jit(fn, in_shardings=(repl, b_sh),
                   out_shardings=(repl, repl))
