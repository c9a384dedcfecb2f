"""Decode benchmark: batched on-device prefix beam search vs host decoders.

Reference decode path (SURVEY.md §3.3): per-utterance Cython beam search on
CPU after copying posteriors off-device — the design BASELINE replaces with
"a batched on-device collective decode".  This benchmark measures the three
implementations on identical posteriors:

  * device  — :func:`tpu_ctc.decode.beam.prefix_beam_search` (fixed-shape
              beam tensors, one jit program, batch decoded in one launch)
  * cpp     — the native host decoder (``cpp/ctc_beam.cpp`` via ctypes),
              standing in for the reference's compiled Cython decoder
  * host_py — the dict-based Python reference (the reference's pure-Python
              decoder role)

Prints ONE JSON line: decode audio-s/s on device, with ``vs_baseline`` =
speedup over the compiled host decoder.

Run: python -m tpu_ctc.bench.bench_decode [--batch 32 --frames 400 --beam 64]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

FRAMES_PER_SECOND = 100.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--beam", type=int, default=64)
    p.add_argument("--vocab", type=int, default=29)
    p.add_argument("--max-len", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--host-utts", type=int, default=4,
                   help="utterances to run through each host decoder")
    p.add_argument("--char-topk", type=int, default=0,
                   help="static per-frame extension-char cap (0 = exact)")
    p.add_argument("--prune-logp", type=float, default=None,
                   help="acoustic log-prob pruning threshold")
    p.add_argument("--lm-order", type=int, default=0,
                   help="fuse a char n-gram LM of this order (trained "
                        "in-repo on random sequences; timing-faithful)")
    p.add_argument("--sweep-beams", default=None, metavar="K1,K2,...",
                   help="bench the fused kernel at each beam width and "
                        "print a sweep table (e.g. 64,100,128,200,256 — "
                        "K>128 runs the 2-bank wide kernel; the "
                        "reference's canonical widths were 100-200, "
                        "SURVEY C9)")
    p.add_argument("--preset4", action="store_true",
                   help="shortcut: the shipped preset-4 decode shape "
                        "(B=64, T=1600, K=128, trigram char LM)")
    p.add_argument("--skip-xla", action="store_true",
                   help="skip the XLA scan-search row (minutes of compile "
                        "+ run at K=128/T=1600-scale shapes)")
    p.add_argument("--neural-lm", type=int, default=0, metavar="H",
                   help="score with a GRU char LM of hidden size H: benches "
                        "the XLA search and, when the kernel supports the "
                        "LM dims, the fused in-kernel GRU path too "
                        "(SURVEY C10 / NAACL'15 headline path)")
    args = p.parse_args()
    if args.preset4:
        args.batch, args.frames, args.beam, args.lm_order = 64, 1600, 128, 3
        args.max_len = 256
        args.host_utts = 0      # host decoders take minutes at this shape

    import jax
    import jax.numpy as jnp
    from tpu_ctc.decode.beam import prefix_beam_search, prefix_beam_search_host
    from tpu_ctc.decode import cpp_decoder

    nlm_params = None
    if args.neural_lm:
        from tpu_ctc.decode import neural_lm
        nlm_cfg = neural_lm.CharRNNLMConfig(vocab_size=args.vocab,
                                            hidden_dim=args.neural_lm)
        nlm_params = neural_lm.init_params(jax.random.PRNGKey(0), nlm_cfg)

    lm_table, lm_order = None, 0
    if args.lm_order:
        from tpu_ctc.decode.lm import train_ngram_lm
        r = np.random.RandomState(7)
        seqs = [list(r.randint(1, args.vocab, size=r.randint(5, 20)))
                for _ in range(200)]
        lm = train_ngram_lm(seqs, vocab_size=args.vocab,
                            order=args.lm_order)
        lm_table, lm_order = lm.tables_device(), args.lm_order

    rng = np.random.RandomState(0)
    # jit the normalization: eager ops on the remote-compile TPU tunnel
    # cost one compile round-trip PER PRIMITIVE (minutes of wall time)
    lp_np = np.asarray(jax.jit(lambda v: jax.nn.log_softmax(v, -1))(
        jnp.asarray(rng.randn(args.batch, args.frames,
                              args.vocab).astype(np.float32))))
    lp = jnp.asarray(lp_np)
    fl = jnp.full((args.batch,), args.frames, jnp.int32)
    audio_s = args.batch * args.frames / FRAMES_PER_SECOND

    from tpu_ctc.ops import beam_pallas

    def time_path(fn, label):
        """Wall time with the scalar-fetch sync discipline (PERF.md)."""
        fn = jax.jit(fn)
        out = fn(lp, fl)
        np.asarray(out[0])      # host fetch = true sync on the TPU tunnel
        t0 = time.time()
        np.asarray(out[0])      # fetch cost alone (ready value)
        sync_cost = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(lp, fl)
        np.asarray(out[0])
        s = max(time.time() - t0 - sync_cost, 1e-9) / args.iters
        log(f"[decode-bench] {label}: {s*1e3:.2f} ms/batch "
            f"({args.batch} utts x {args.frames} frames) "
            f"-> {audio_s/s:,.0f} audio-s/s")
        return s

    lm_kw = dict(lm_table=lm_table, lm_order=lm_order,
                 char_topk=args.char_topk, prune_logp=args.prune_logp)
    sweep = {}
    for kb in ([int(x) for x in args.sweep_beams.split(",")]
               if args.sweep_beams else []):
        s = time_path(
            lambda x, l, kb=kb: beam_pallas.beam_search_pallas(
                x, l, beam_width=kb, max_len=args.max_len, **lm_kw),
            f"fused kernel K={kb}")
        sweep[kb] = round(audio_s / s, 1)

    ker_s = None
    if nlm_params is None and beam_pallas.supported(
            args.beam, args.vocab, lm_order, char_topk=args.char_topk):
        ker_s = time_path(
            lambda x, l: beam_pallas.beam_search_pallas(
                x, l, beam_width=args.beam, max_len=args.max_len, **lm_kw),
            f"fused kernel K={args.beam}"
            + (f" trigram (preset-4 shape)" if args.preset4 else ""))

    dev_s = None
    if not args.skip_xla:
        dev_s = time_path(
            lambda x, l: prefix_beam_search(
                x, l, beam_width=args.beam, max_len=args.max_len,
                nlm_params=nlm_params, **lm_kw),
            "xla search")
    best_s = ker_s if ker_s is not None else dev_s
    dev_thr = audio_s / best_s if best_s is not None else None

    if nlm_params is not None and beam_pallas.supported(
            args.beam, args.vocab, lm_order, nlm_params=nlm_params,
            char_topk=args.char_topk):
        fk_s = time_path(
            lambda x, l: beam_pallas.beam_search_pallas(
                x, l, beam_width=args.beam, max_len=args.max_len,
                nlm_params=nlm_params, **lm_kw),
            "fused-kernel neural-LM")
        if dev_s is not None:
            log(f"[decode-bench] fused neural kernel is {dev_s/fk_s:.1f}x "
                "the XLA search")
        dev_thr = max(dev_thr or 0.0, audio_s / fk_s)

    n = min(args.host_utts, args.batch)
    cpp_thr = None
    if n > 0 and (cpp_decoder.available() or cpp_decoder.build()):
        lens = np.full(n, args.frames, np.int32)
        # warmup (ctypes dispatch, page-in) so host and device timing are
        # measured the same way
        cpp_decoder.beam_search_batch(lp_np[:1], lens[:1],
                                      beam_width=args.beam,
                                      max_len=args.max_len)
        t0 = time.time()
        cpp_decoder.beam_search_batch(lp_np[:n], lens, beam_width=args.beam,
                                      max_len=args.max_len)
        cpp_s = (time.time() - t0) / n
        cpp_thr = (args.frames / FRAMES_PER_SECOND) / cpp_s
        log(f"[decode-bench] cpp host: {cpp_s*1e3:.1f} ms/utt "
            f"-> {cpp_thr:,.0f} audio-s/s")

    if n > 0:
        t0 = time.time()
        for i in range(min(2, n)):
            prefix_beam_search_host(lp_np[i], beam_width=args.beam)
        py_s = (time.time() - t0) / min(2, n)
        log(f"[decode-bench] python host: {py_s*1e3:.1f} ms/utt "
            f"-> {(args.frames/FRAMES_PER_SECOND)/py_s:,.0f} audio-s/s")

    out = {
        "metric": "decode_throughput",
        "value": round(dev_thr, 1) if dev_thr is not None else None,
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(dev_thr / cpp_thr, 2) if cpp_thr else None,
    }
    if sweep:
        out["beam_sweep"] = {str(k): v for k, v in sorted(sweep.items())}
    if args.preset4:
        out["shape"] = "preset4:B=64,T=1600,K=128,trigram"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
