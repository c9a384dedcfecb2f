"""Collective batched decoding over the device mesh (SURVEY.md P7).

Reference analogue: per-utterance CPU beam search (SURVEY.md §3.3).  Here
the batched on-device beam search shards utterances over the 'data' mesh
axis; XLA partitions the vmapped search per-device and, because the
outputs are requested replicated, inserts the ``all_gather`` that
exchanges final hypothesis state across chips/hosts (BASELINE:
"beam-search hypothesis state is exchanged via collectives for batched
decode").  The only host crossing is reading the final id buffers.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ctc.config import Config
from tpu_ctc.decode.beam import prefix_beam_search
from tpu_ctc.decode.greedy import collapse_ids
from tpu_ctc.decode.lm import NGramCharLM
from tpu_ctc.models import birnn
from tpu_ctc.parallel.mesh import AXIS_DATA


def make_collective_decoder(cfg: Config, mesh: Mesh,
                            lm: Optional[NGramCharLM] = None,
                            nlm_params=None, use_beam: bool = True,
                            max_len: int = 128):
    """Build a jit'd (params, batch) -> (hyps, lens) decoder on the mesh.

    Inputs are consumed sharded over 'data'; outputs are produced
    replicated (the all_gather is XLA's), so every host sees every
    hypothesis — the multi-host decode contract.
    """
    data = NamedSharding(mesh, P(AXIS_DATA))
    repl = NamedSharding(mesh, P())
    b_sh = {"feats": data, "frame_mask": data, "frame_lengths": data,
            "labels": data, "label_lengths": data, "weights": data}
    lm_table = lm.tables_device() if lm is not None else None
    lm_order = lm.order if lm is not None else 0

    def decode(params, batch):
        log_probs = birnn.log_posteriors(params, cfg.model, batch["feats"],
                                         batch["frame_mask"])
        if use_beam:
            hyps, lens, _ = prefix_beam_search(
                log_probs, batch["frame_lengths"],
                beam_width=cfg.decode.beam_width, max_len=max_len,
                lm_table=lm_table, lm_order=lm_order,
                lm_alpha=cfg.decode.lm_alpha, lm_beta=cfg.decode.lm_beta,
                nlm_params=nlm_params)
        else:
            import jax.numpy as jnp
            ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            hyps, lens = collapse_ids(ids, batch["frame_mask"])
        return hyps, lens

    fn = decode
    if dict(mesh.shape).get(AXIS_DATA, 1) > 1:
        # shard_map so the Pallas BiRNN forward (opaque to GSPMD) runs
        # batch-sharded; the replicated out_shardings below then make XLA
        # all_gather each shard's hypotheses across the mesh.
        b_specs = {k: P(AXIS_DATA) for k in b_sh}
        fn = jax.shard_map(decode, mesh=mesh, in_specs=(P(), b_specs),
                           out_specs=P(AXIS_DATA), check_vma=False)

    return jax.jit(fn, in_shardings=(repl, b_sh),
                   out_shardings=(repl, repl))
