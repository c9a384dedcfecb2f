"""CTC kernel micro-benchmark: Pallas DP vs jnp lax.scan, fwd and fwd+bwd.

BASELINE.md instruments "CTC-loss kernel TFLOP/s"; the DP is mostly
log-sum-exp (transcendental-bound, ~10 flops/cell), so we report both
lattice cells/s and the derived TFLOP/s, plus wall-clock speedup.

Run: python -m tpu_ctc.bench.bench_ctc [--batch 32 --frames 1600 --labels 120]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ctc.losses import ctc_ref
from tpu_ctc.ops import ctc_pallas

FLOPS_PER_CELL = 10.0  # lse3: 3 exp + log + adds (counting transcendentals as 1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=10, warmup=2):
    def sync(x):
        # host fetch = true sync: block_until_ready alone can return
        # before queued executions finish on this TPU tunnel
        np.asarray(jax.tree.leaves(x)[0])

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    # The fetch itself costs ~10-30 ms of tunnel latency; measure it on
    # the already-ready value and subtract it from the timed loop.
    t0 = time.time()
    sync(out)
    sync_cost = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return max(time.time() - t0 - sync_cost, 1e-9) / iters


def run(batch=32, frames=1600, labels=120, vocab=29, iters=10,
        force_q=None):
    """force_q: override the lane-packing plan (1 = unpacked, q > 1 =
    pack q utts per 128-lane row) for packed-vs-unpacked comparisons
    (VERDICT r3 #5)."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(batch, frames, vocab).astype(np.float32))
    labs = jnp.asarray(rng.randint(1, vocab, (batch, labels)).astype(np.int32))
    tl = jnp.full((batch,), frames, jnp.int32)
    ll = jnp.full((batch,), labels, jnp.int32)

    cells = batch * frames * (2 * labels + 1)

    def pal_loss(x):
        lp = jax.nn.log_softmax(x.astype(jnp.float32), -1)
        return ctc_pallas.ctc_loss_from_log_probs(lp, labs, tl, ll,
                                                  force_q=force_q)

    fwd_ref = jax.jit(lambda x: ctc_ref.ctc_loss(x, labs, tl, ll))
    fwd_pal = jax.jit(pal_loss)
    grad_ref = jax.jit(jax.grad(lambda x: jnp.sum(
        ctc_ref.ctc_loss(x, labs, tl, ll))))
    grad_pal = jax.jit(jax.grad(lambda x: jnp.sum(pal_loss(x))))

    # correctness spot-check before timing
    np.testing.assert_allclose(np.asarray(fwd_pal(logits)),
                               np.asarray(fwd_ref(logits)), rtol=1e-3)

    # Device time from profiler traces: wall-clock micro-benchmarks are
    # unreliable on this TPU tunnel (see tpu_ctc.utils.devtime).  The slow
    # jnp references use fewer iters to bound trace size.
    from tpu_ctc.utils.devtime import device_time_ms
    results = {}
    for name, fn in [("fwd_jnp", fwd_ref), ("fwd_pallas", fwd_pal),
                     ("grad_jnp", grad_ref), ("grad_pallas", grad_pal)]:
        n = max(2, iters // 3) if name.endswith("jnp") else iters
        dt = device_time_ms(fn, logits, iters=n) / 1e3
        results[name] = dt
        log(f"[ctc-bench] {name:12s} {dt*1e3:8.2f} ms  "
            f"{cells/dt/1e9:7.2f} Gcells/s  "
            f"{cells*FLOPS_PER_CELL/dt/1e12:6.3f} TFLOP/s-equiv")
    log(f"[ctc-bench] fwd speedup {results['fwd_jnp']/results['fwd_pallas']:.2f}x, "
        f"grad speedup {results['grad_jnp']/results['grad_pallas']:.2f}x")
    return results, cells


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=1600)
    p.add_argument("--labels", type=int, default=120)
    p.add_argument("--vocab", type=int, default=29)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--force-q", type=int, default=None,
                   help="override lane packing: 1 = unpacked, q > 1 = "
                        "pack q utts per 128-lane row")
    args = p.parse_args()
    results, cells = run(args.batch, args.frames, args.labels, args.vocab,
                         args.iters, force_q=args.force_q)
    import json
    print(json.dumps({
        "metric": "ctc_grad_cells_per_s",
        "value": round(cells / results["grad_pallas"] / 1e9, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(results["grad_jnp"] / results["grad_pallas"], 3),
    }))


if __name__ == "__main__":
    main()
