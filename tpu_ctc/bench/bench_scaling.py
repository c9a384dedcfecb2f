"""DP scaling-efficiency harness (SURVEY.md §7.1-12, BASELINE ">= 8x at 8
hosts").

Weak scaling: fixed per-device batch, growing 'data' axis.  Reports
per-step time and efficiency = t(1 device) / t(N devices) — 1.0 is
perfect weak scaling (throughput grows linearly with devices).

On a pod slice run it under `jax.distributed` per host (the mesh helper
places DP over DCN); in this single-chip environment it degenerates to
N=1 on the TPU, and `--force-cpu-devices 8` exercises the harness (and
the DP shard_map collectives) on a virtual CPU mesh — functional
validation only; CPU timings say nothing about ICI scaling.

Prints ONE JSON line {"metric": "dp_scaling_efficiency", ...}.
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


def measure(n_dev, *, per_dev_batch, frames, hidden, layers, steps,
            strategy="dp", fixed_batch=0):
    """One strategy/mesh point.  strategy:
      dp — 'data' = n_dev (weak scaling: batch grows with devices)
      sp — 'seq'  = n_dev (fixed batch; time axis sharded)
      pp — 'model' = n_dev pipeline STAGES (fixed batch; quantifies the
           GPipe idle-tick tax: (s-1)/(s+m-1) of stage ticks are
           structurally idle, plus replicated pre/post work — VERDICT
           r3 #5's measurement)
    """
    import jax
    from tpu_ctc.config import (Config, DataConfig, MeshConfig, ModelConfig,
                                OptimConfig, TrainConfig)
    from tpu_ctc.data.bucketing import make_batch
    from tpu_ctc.parallel.mesh import make_mesh
    from tpu_ctc.train.loop import batch_to_device_dict
    from tpu_ctc.train.step import (batch_shardings, create_train_state,
                                    make_train_step)

    batch = fixed_batch or per_dev_batch * n_dev
    mesh_cfg = {
        "dp": dict(data=n_dev, model=1, seq=1),
        "sp": dict(data=1, model=1, seq=n_dev),
        "pp": dict(data=1, model=n_dev, seq=1,
                   pipeline=n_dev > 1, pipeline_microbatches=4),
    }[strategy]
    cfg = Config(
        model=ModelConfig(input_dim=120, hidden_dim=hidden, num_pre_layers=1,
                          num_bi_layers=layers, vocab_size=29),
        optim=OptimConfig(learning_rate=1e-3),
        data=DataConfig(batch_size=batch, max_frames=frames,
                        bucket_boundaries=(frames,)),
        mesh=MeshConfig(**mesh_cfg),
        train=TrainConfig(metrics_path=""))
    rng = np.random.RandomState(0)
    utts = [(rng.randn(frames, 120).astype(np.float32),
             rng.randint(1, 29, 40).astype(np.int32)) for _ in range(batch)]
    b = make_batch(utts, t_pad=frames, l_pad=48, batch_size=batch)
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:n_dev])
    state = create_train_state(cfg)
    step_fn, state = make_train_step(cfg, mesh, state)
    bd = jax.device_put(batch_to_device_dict(b), batch_shardings(mesh))
    with mesh:
        for _ in range(3):
            state, m = step_fn(state, bd)
        # Host-fetch a scalar: block_until_ready alone can return before
        # fast queued steps finish on this TPU tunnel (see verify recipe).
        float(m["loss"])
        t0 = time.time()
        float(m["loss"])        # fetch cost alone (ready value)
        sync_cost = time.time() - t0
        t0 = time.time()
        for _ in range(steps):
            state, m = step_fn(state, bd)
        loss = float(m["loss"])
        dt = max(time.time() - t0 - sync_cost, 1e-9) / steps
    thr = batch * frames / FRAMES_PER_SECOND / dt
    log(f"[scaling] {n_dev} device(s): batch {batch}, step {dt*1e3:.1f} ms, "
        f"{thr:,.0f} audio-s/s total, loss={loss:.3f}")
    return dt, thr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--device-counts", type=str, default="",
                   help="comma list, default: 1 and all available")
    p.add_argument("--force-cpu-devices", type=int, default=0,
                   help="use a virtual N-device CPU mesh (functional check)")
    p.add_argument("--strategy", choices=("dp", "sp", "pp"), default="dp",
                   help="dp: weak-scaled data parallel; sp/pp: FIXED batch "
                        "sharded over 'seq' / staged over 'model'")
    p.add_argument("--fixed-batch", type=int, default=0,
                   help="override the global batch (default: "
                        "per-device-batch, weak-scaled only for dp)")
    args = p.parse_args()

    if args.force_cpu_devices:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.force_cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    avail = len(jax.devices())
    counts = ([int(x) for x in args.device_counts.split(",") if x]
              or sorted({1, avail}))
    counts = [c for c in counts if c <= avail]
    fixed = args.fixed_batch
    if args.strategy != "dp" and not fixed:
        fixed = args.per_device_batch      # sp/pp: fixed batch by default
    kw = dict(per_dev_batch=args.per_device_batch, frames=args.frames,
              hidden=args.hidden, layers=args.layers, steps=args.steps,
              strategy=args.strategy, fixed_batch=fixed)
    results = {c: measure(c, **kw) for c in counts}
    base_dt = results[counts[0]][0]
    n_max = counts[-1]
    eff = base_dt / results[n_max][0]
    if args.strategy == "dp":
        log(f"[scaling] weak-scaling efficiency at {n_max} devices: {eff:.3f}")
    else:
        # fixed batch: eff = speedup (sp) / slowdown i.e. pipeline tax (pp)
        log(f"[scaling] {args.strategy} t(1)/t({n_max}) at fixed batch: "
            f"{eff:.3f}")
    print(json.dumps({
        "metric": f"{args.strategy}_scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"t(1)/t({n_max}) "
                + ("weak scaling" if args.strategy == "dp"
                   else "fixed batch")
                + f" ({jax.devices()[0].platform})",
        "vs_baseline": round(results[n_max][1] / results[counts[0]][1], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
