#!/usr/bin/env python
"""Decode hyperparameter sweep: grid over (lm_alpha, lm_beta) on a dev split.

The role the reference's ``decoder_config.py`` constants + ad-hoc sweep
scripts played (SURVEY.md C9): pick the LM fusion weight alpha and the
insertion bonus beta on a DEV split, then decode the eval split once with
the winners.  Posteriors are computed once and cached host-side; each
grid point re-runs only the fused beam search (alpha/beta are
compile-time constants of the kernel, so each point costs one ~5 s
compile + the search itself).

Usage (mirrors `cli decode` flags):
  python tools/sweep_decode.py --config 2 --set model.hidden_dim=512 ... \
      --data /tmp/r5_manifests --split dev --checkpoint /tmp/run/checkpoints \
      --alphas 0.5,0.75,1.0,1.25 --betas 0.5,1.0,1.5,2.0 [--neural-lm]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    from tpu_ctc.cli import _parse_overrides

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="default")
    p.add_argument("--set", action="append", metavar="PATH=VAL")
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="dev")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--alphas", default="0.5,0.75,1.0,1.25,1.5")
    p.add_argument("--betas", default="0.0,0.5,1.0,1.5,2.0")
    p.add_argument("--unit", choices=["word", "char"], default="word")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpu_ctc.config import get_config
    from tpu_ctc.data.alphabet import DEFAULT_ALPHABET
    from tpu_ctc.data.bucketing import BucketedLoader
    from tpu_ctc.data.manifest import ManifestDataset
    from tpu_ctc.decode.lm import train_char_lm_from_data
    from tpu_ctc.decode.wer import score_corpus
    from tpu_ctc.models import birnn
    from tpu_ctc.ops import beam_pallas
    from tpu_ctc.parallel.mesh import make_mesh
    from tpu_ctc.train import checkpoint as ckpt_lib
    from tpu_ctc.train.loop import batch_to_device_dict
    from tpu_ctc.train.step import create_train_state

    cfg = get_config(args.config, **_parse_overrides(args.set))
    alphabet = DEFAULT_ALPHABET
    data = ManifestDataset(args.data, cfg, split=args.split)
    lm_data = ManifestDataset(args.data, cfg, split="train")

    state = create_train_state(cfg)
    mgr = ckpt_lib.make_manager(args.checkpoint)
    restored = ckpt_lib.restore(mgr, state)
    assert restored is not None, f"no checkpoint in {args.checkpoint}"
    state = restored[0]

    lm = train_char_lm_from_data(lm_data, cfg) if cfg.decode.lm_order else None
    lm_table = lm.tables_device() if lm is not None else None
    lm_order = lm.order if lm is not None else 0
    nlm_params = None
    if getattr(cfg.decode, "neural_lm", False):
        from tpu_ctc.decode.neural_lm import train_nlm_from_data
        nlm_params = train_nlm_from_data(lm_data, cfg)

    # ---- posteriors once, cached host-side -----------------------------
    from tpu_ctc.cli import _utt_ids

    mesh = make_mesh(cfg.mesh)
    loader = BucketedLoader(data, cfg.data)
    fwd = jax.jit(lambda p, f, m: birnn.log_posteriors(p, cfg.model, f, m))
    cached = []          # (log_probs np [B,T,A], lens, ref dict rows)
    ids = _utt_ids(data)
    refs = {}
    with mesh:
        for _, batch in loader.epoch(0):
            bd = batch_to_device_dict(batch)
            lp = np.asarray(fwd(state.params, bd["feats"],
                                bd["frame_mask"]))
            utts = []
            for b in range(len(lp)):
                if batch.weights[b] > 0:
                    utt = ids[int(batch.utt_indices[b])]
                    refs[utt] = alphabet.decode(
                        batch.labels[b][:batch.label_lengths[b]])
                    utts.append((b, utt))
            cached.append((lp, np.asarray(batch.frame_lengths),
                           np.asarray(batch.labels.shape[1]), utts))
    log(f"[sweep] cached posteriors for {len(refs)} utts "
        f"in {len(cached)} batches")

    k = cfg.decode.beam_width
    # same routing as cli decode: fused kernel when supported, XLA scan
    # fallback otherwise (a kernel-unsupported config must sweep, not
    # crash after the posteriors are already cached)
    use_kernel = (getattr(cfg.decode, "use_fused_kernel", True)
                  and beam_pallas.supported(
                      k, cfg.model.vocab_size, lm_order,
                      nlm_params=nlm_params,
                      char_topk=cfg.decode.char_topk))
    if not use_kernel:
        from tpu_ctc.decode.beam import prefix_beam_search
        log("[sweep] fused kernel unsupported for this config — using "
            "the XLA scan search (slower per grid point)")
    results = []
    alphas = [float(x) for x in args.alphas.split(",")]
    betas = [float(x) for x in args.betas.split(",")]
    for alpha in alphas:
        for beta in betas:
            hyps = {}
            for lp, lens, l_pad, utts in cached:
                max_len = min(int(l_pad) * 2 + 16, lp.shape[1])
                search = (beam_pallas.beam_search_pallas if use_kernel
                          else prefix_beam_search)
                hyp, hlen, _ = search(
                    jnp.asarray(lp), jnp.asarray(lens), beam_width=k,
                    max_len=max_len, lm_table=lm_table, lm_order=lm_order,
                    lm_alpha=alpha, lm_beta=beta,
                    prune_logp=cfg.decode.prune_logp,
                    char_topk=cfg.decode.char_topk, nlm_params=nlm_params)
                hyp, hlen = np.asarray(hyp), np.asarray(hlen)
                for b, utt in utts:
                    hyps[utt] = alphabet.decode(hyp[b][:hlen[b]])
            totals, _ = score_corpus(refs, hyps, args.unit)
            er = totals["error_rate"]
            results.append({"alpha": alpha, "beta": beta,
                            "error_rate": round(er, 4)})
            log(f"[sweep] alpha={alpha:<5} beta={beta:<5} "
                f"{args.unit[0].upper()}ER={100*er:.2f}%")
    best = min(results, key=lambda r: r["error_rate"])
    print(json.dumps({"best": best, "grid": results, "unit": args.unit,
                      "split": args.split, "n_utts": len(refs)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
