"""Benchmark driver: training throughput in audio-seconds/s per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.md): audio-seconds of speech processed per
wall-clock second per chip while *training* (fwd + CTC + bwd + SGD update),
on the BASELINE config-2/3 model family.  ``vs_baseline`` is the speedup
over the in-repo CPU reference implementation
(:mod:`tpu_ctc.bench.reference_numpy`), which faithfully reproduces the
reference's per-utterance Python-loop + numpy-CTC training path
(SURVEY.md §3.1) — the target is >= 10x.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

FRAMES_PER_SECOND = 100.0  # 10 ms hop


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu_train(hidden=1024, num_bi=3, batch=32, t_frames=400,
                    vocab=29, input_dim=120, steps=20, warmup=3):
    import jax

    from tpu_ctc.config import (Config, DataConfig, MeshConfig, ModelConfig,
                                OptimConfig, TrainConfig)
    from tpu_ctc.data.bucketing import make_batch
    from tpu_ctc.parallel.mesh import make_mesh
    from tpu_ctc.train.loop import batch_to_device_dict
    from tpu_ctc.train.step import create_train_state, make_train_step

    cfg = Config(
        model=ModelConfig(input_dim=input_dim, hidden_dim=hidden,
                          num_pre_layers=1, num_bi_layers=num_bi,
                          vocab_size=vocab),
        optim=OptimConfig(learning_rate=1e-3),
        data=DataConfig(batch_size=batch, max_frames=t_frames,
                        bucket_boundaries=(t_frames,)),
        mesh=MeshConfig(data=1, model=1, seq=1),
        train=TrainConfig(metrics_path=""),
        ctc_impl="auto",
    )
    rng = np.random.RandomState(0)
    utts = [(rng.randn(t_frames, input_dim).astype(np.float32),
             rng.randint(1, vocab, 40).astype(np.int32))
            for _ in range(batch)]
    b = make_batch(utts, t_pad=t_frames, l_pad=48, batch_size=batch)

    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:1])
    state = create_train_state(cfg)
    step_fn, state = make_train_step(cfg, mesh, state)
    # Device-resident batch: the training loop prefetches input transfers
    # on a background thread (tpu_ctc.data.prefetch), so steady-state step
    # time is compute-bound — that is what we measure.
    from tpu_ctc.train.step import batch_shardings
    bd = jax.device_put(batch_to_device_dict(b), batch_shardings(mesh))

    with mesh:
        t0 = time.time()
        for _ in range(warmup):
            state, m = step_fn(state, bd)
        # Host-fetch a scalar for a true sync: block_until_ready alone can
        # return before queued steps finish on this TPU tunnel.
        log(f"[bench] warmup+compile {time.time()-t0:.1f}s, "
            f"loss={float(m['loss']):.3f}")
        t0 = time.time()
        float(m["loss"])        # fetch cost alone (ready value)
        sync_cost = time.time() - t0
        t0 = time.time()
        for _ in range(steps):
            state, m = step_fn(state, bd)
        float(m["loss"])
        dt = max(time.time() - t0 - sync_cost, 1e-9)

    audio_s = batch * t_frames / FRAMES_PER_SECOND * steps
    thr = audio_s / dt
    log(f"[bench] tpu train: {steps} steps in {dt:.2f}s -> "
        f"{thr:.1f} audio-s/s/chip (step {dt/steps*1e3:.1f} ms)")
    dev = jax.devices()[0]
    log(f"[bench] device: {dev.platform} {dev.device_kind}")
    return thr


def bench_tpu_decode(batch=32, t_frames=400, vocab=29, beam=64, iters=10):
    """Beam-decode throughput (audio-s/s/chip) of the fused Pallas search
    vs the XLA scan search, on device-resident posteriors (SURVEY C9;
    VERDICT r2 item 1).  Returns (pallas_thr, xla_thr)."""
    import jax
    import jax.numpy as jnp

    from tpu_ctc.decode.beam import prefix_beam_search
    from tpu_ctc.ops.beam_pallas import beam_search_pallas

    rng = np.random.RandomState(0)
    x = rng.randn(batch, t_frames, vocab).astype(np.float32) * 2
    lp = jnp.asarray(x - np.log(np.exp(x).sum(-1, keepdims=True)))
    lens = jnp.full((batch,), t_frames, jnp.int32)
    audio_s = batch * t_frames / FRAMES_PER_SECOND

    def run(fn, label, audio=audio_s, n_iters=iters):
        out = fn()
        jax.block_until_ready(out[0])
        _ = float(out[2][0])            # true sync (see module docstring)
        t0 = time.time()
        for _ in range(n_iters):
            out = fn()
        jax.block_until_ready(out[0])
        _ = float(out[2][0])
        dt = (time.time() - t0) / n_iters
        thr = audio / dt
        log(f"[bench] {label}: {dt*1e3:.1f} ms/batch -> {thr:.0f} audio-s/s")
        return thr

    pallas_thr = run(lambda: beam_search_pallas(
        lp, lens, beam_width=beam, max_len=128), "decode pallas")
    xla_thr = run(lambda: prefix_beam_search(
        lp, lens, beam_width=beam, max_len=128), "decode xla")

    # Preset 4's OWN shape (VERDICT r4 item 1): B=64, T=1600, K=128,
    # trigram char LM — the flagship decode preset as shipped.
    from tpu_ctc.decode.lm import train_ngram_lm
    r4 = np.random.RandomState(7)
    seqs = [list(r4.randint(1, vocab, size=r4.randint(5, 20)))
            for _ in range(200)]
    lm = train_ngram_lm(seqs, vocab_size=vocab, order=3)
    x4 = r4.randn(64, 1600, vocab).astype(np.float32) * 2
    lp4 = jnp.asarray(x4 - np.log(np.exp(x4).sum(-1, keepdims=True)))
    lens4 = jnp.full((64,), 1600, jnp.int32)
    audio4 = 64 * 1600 / FRAMES_PER_SECOND

    p4_thr = run(lambda: beam_search_pallas(
        lp4, lens4, beam_width=128, max_len=256,
        lm_table=lm.tables_device(), lm_order=3,
        lm_alpha=1.25, lm_beta=1.5),
        "decode preset4 (B=64/T=1600/K=128/trigram)",
        audio=audio4, n_iters=5)

    # The NAACL'15 headline path: GRU char LM fused in-kernel (per-beam
    # state in VMEM).  The XLA neural search (~850 audio-s/s, >4 min
    # compile at this shape) is benched separately by bench_decode.
    from tpu_ctc.decode import neural_lm
    nlm = neural_lm.init_params(
        jax.random.PRNGKey(0),
        neural_lm.CharRNNLMConfig(vocab_size=vocab, embed_dim=64,
                                  hidden_dim=128))
    nlm_thr = run(lambda: beam_search_pallas(
        lp, lens, beam_width=beam, max_len=128, nlm_params=nlm,
        lm_alpha=0.7, lm_beta=0.3), "decode pallas+GRU-LM")
    return pallas_thr, xla_thr, nlm_thr, p4_thr


def bench_cpu_reference(hidden=1024, num_bi=3, t_frames=400, vocab=29,
                        input_dim=120, utts=3, budget_s=120.0):
    """The reference's CPU path: per-utterance, Python time loop, numpy CTC."""
    from tpu_ctc.bench.reference_numpy import ReferenceBRNN

    model = ReferenceBRNN(input_dim=input_dim, hidden_dim=hidden,
                          vocab_size=vocab, num_pre=1, num_bi=num_bi)
    rng = np.random.RandomState(0)
    velocity = None
    done, t_total = 0, 0.0
    for i in range(utts):
        feats = rng.randn(t_frames, input_dim)
        labels = rng.randint(1, vocab, 40)
        t0 = time.time()
        nll, grads = model.cost_and_grad(feats, labels)
        velocity = model.sgd_step(grads, velocity=velocity)
        t_total += time.time() - t0
        done += 1
        if t_total > budget_s:
            break
    thr = done * (t_frames / FRAMES_PER_SECOND) / t_total
    log(f"[bench] cpu reference: {done} utts in {t_total:.2f}s -> "
        f"{thr:.2f} audio-s/s")
    return thr


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--skip-cpu-baseline", action="store_true")
    args = p.parse_args()

    kw = dict(hidden=args.hidden, num_bi=args.layers, t_frames=args.frames)
    tpu_thr = bench_tpu_train(batch=args.batch, steps=args.steps, **kw)
    # A transient tunnel failure in a secondary bench must not zero the
    # whole artifact: record what succeeded.
    try:
        dec_thr, dec_xla, dec_nlm, dec_p4 = bench_tpu_decode(
            t_frames=args.frames)
    except Exception as e:       # pragma: no cover - environment flake
        log(f"[bench] decode bench failed: {type(e).__name__}: {e}")
        dec_thr = dec_xla = dec_nlm = dec_p4 = None
    if args.skip_cpu_baseline:
        cpu_thr = None
    else:
        try:
            cpu_thr = bench_cpu_reference(**kw)
        except Exception as e:   # pragma: no cover - environment flake
            log(f"[bench] cpu reference failed: {type(e).__name__}: {e}")
            cpu_thr = None

    print(json.dumps({
        "metric": "train_throughput",
        "value": round(tpu_thr, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(tpu_thr / cpu_thr, 2) if cpu_thr else None,
        # second axis (VERDICT r2): exact beam decode, B=32/T=400/K=64
        "decode_throughput": round(dec_thr, 2) if dec_thr else None,
        "decode_unit": "audio_seconds_per_second_per_chip",
        "decode_vs_xla_search": (round(dec_thr / dec_xla, 2)
                                 if dec_thr and dec_xla else None),
        # NAACL'15 headline path: GRU char LM fused in-kernel
        "decode_neural_lm_throughput": (round(dec_nlm, 2)
                                        if dec_nlm else None),
        # flagship preset 4 at its shipped shape (B=64/T=1600/K=128/3-gram)
        "decode_preset4_throughput": (round(dec_p4, 2) if dec_p4 else None),
    }), flush=True)


if __name__ == "__main__":
    main()
