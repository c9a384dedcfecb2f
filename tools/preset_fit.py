"""Preset fit check: HBM budget arithmetic + on-chip compile/step proof.

VERDICT r4 item 1b: preset 5 (wide TP, H=4096) shipped as a config whose
width had never been compiled or run on real hardware.  This tool

  1. prints the analytic HBM budget of a preset at its SHIPPED shape
     (params, optimizer state, training activations, CTC/stream tensors)
     against one chip's HBM and against the preset's TP mesh division
     (``--budget``);
  2. actually initializes and steps the preset's model ON THE CURRENT
     DEVICE at a shape the arithmetic says fits (``--step``), proving
     the width compiles and trains on silicon; and
  3. dry-runs the preset's TP train step at REAL width over a virtual
     CPU mesh (``--tp-dryrun``, run under
     ``XLA_FLAGS=--xla_force_host_platform_device_count=N
     JAX_PLATFORMS=cpu``).

Usage:
  python tools/preset_fit.py --preset 5 --budget
  python tools/preset_fit.py --preset 5 --step --batch 8 --frames 400
  XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
      python tools/preset_fit.py --preset 5 --tp-dryrun --frames 16
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

GB = 1024 ** 3
V5E_HBM_GB = 16.0          # TPU v5 lite per-chip HBM


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def param_bytes(cfg):
    import jax
    from tpu_ctc.models import birnn
    params = jax.eval_shape(
        lambda k: birnn.init_params(k, cfg.model),
        jax.ShapeDtypeStruct((2,), np.uint32))
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(params))


def budget(cfg, batch, frames, tp):
    """Training-step HBM budget in bytes, itemized.

    Activation model matches train/step.py: the fused recurrence streams
    z/h/g per direction per bi layer in the model's compute dtype
    (bf16 = 2 B) at [T, B, H], and the backward pass keeps the saved
    forward streams plus one delta stream live; pre/post/output layers
    hold [T, B, H] activations each.  CTC holds [B, T, A] log-probs plus
    alpha checkpoints (small next to the H-sized streams).
    """
    m = cfg.model
    h, t, b = m.hidden_dim, frames, batch
    io_bytes = 2 if m.compute_dtype == "bfloat16" else 4
    p = param_bytes(cfg)
    opt = p                                   # Nesterov velocity (f32)
    tbh = t * b * h * io_bytes
    # per bi layer: input x + per-direction (z, h, g) saved for backward
    act_bi = m.num_bi_layers * (1 + 2 * 3) * tbh
    act_dense = (m.num_pre_layers + m.num_post_layers + 1) * tbh
    act_ctc = b * t * m.vocab_size * 4 * 3    # log-probs, grads, lattice
    bwd_scratch = 2 * tbh                     # live delta + dx per sweep
    total = p + opt + act_bi + act_dense + act_ctc + bwd_scratch
    rows = {
        "params": p, "optimizer_state": opt,
        "bi_layer_streams": act_bi, "dense_activations": act_dense,
        "ctc_tensors": act_ctc, "bwd_scratch": bwd_scratch,
        "total": total,
    }
    # TP divides the H-sharded streams and weights by the model axis;
    # CTC/output tensors stay batch-replicated per shard in the current
    # layout (vocab is tiny).
    rows["total_per_tp_shard"] = (
        (p + opt + act_bi + act_dense + bwd_scratch) // tp + act_ctc)
    return rows


def cmd_budget(cfg, args):
    tp = max(cfg.mesh.model, 1)
    shipped = budget(cfg, cfg.data.batch_size, cfg.data.max_frames, tp)
    print(f"preset {cfg.name}: H={cfg.model.hidden_dim}, "
          f"{cfg.model.num_bi_layers} bi layers, shipped shape "
          f"B={cfg.data.batch_size} T={cfg.data.max_frames}, TP={tp}")
    for k, v in shipped.items():
        print(f"  {k:>22}: {v / GB:7.2f} GiB")
    fits1 = shipped["total"] / GB < V5E_HBM_GB * 0.9
    fits_tp = shipped["total_per_tp_shard"] / GB < V5E_HBM_GB * 0.9
    print(f"  one v5e chip ({V5E_HBM_GB:.0f} GiB): "
          f"{'FITS' if fits1 else 'DOES NOT FIT'} single-chip; "
          f"per-TP{tp}-shard {'FITS' if fits_tp else 'DOES NOT FIT'}")
    # the largest single-chip training shape the arithmetic admits
    if not fits1:
        b = cfg.data.batch_size
        while b > 1 and budget(cfg, b, cfg.data.max_frames, 1)["total"] \
                / GB > V5E_HBM_GB * 0.8:
            b //= 2
        print(f"  largest single-chip batch at T={cfg.data.max_frames}: "
              f"~{b} "
              f"({budget(cfg, b, cfg.data.max_frames, 1)['total']/GB:.1f} "
              f"GiB)")
    return shipped


def cmd_step(cfg, args):
    """Init + train-step the preset's model at its real WIDTH on the
    current device (single chip, reduced batch/frames per --batch/--frames
    so the run fits one chip's HBM)."""
    import jax

    from tpu_ctc.config import DataConfig, MeshConfig
    import dataclasses

    from tpu_ctc.data.bucketing import make_batch
    from tpu_ctc.parallel.mesh import make_mesh
    from tpu_ctc.train.loop import batch_to_device_dict
    from tpu_ctc.train.step import (batch_shardings, create_train_state,
                                    make_train_step)

    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(batch_size=args.batch, max_frames=args.frames,
                        bucket_boundaries=(args.frames,)),
        mesh=MeshConfig(data=1, model=1, seq=1))
    est = budget(cfg, args.batch, args.frames, 1)["total"] / GB
    log(f"[preset-fit] stepping H={cfg.model.hidden_dim} at "
        f"B={args.batch} T={args.frames} (est {est:.1f} GiB) on "
        f"{jax.devices()[0].device_kind}")
    rng = np.random.RandomState(0)
    utts = [(rng.randn(args.frames, cfg.model.input_dim).astype(np.float32),
             rng.randint(1, cfg.model.vocab_size, 24).astype(np.int32))
            for _ in range(args.batch)]
    batch = make_batch(utts, t_pad=args.frames, l_pad=32,
                       batch_size=args.batch)
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:1])
    state = create_train_state(cfg)
    step_fn, state = make_train_step(cfg, mesh, state)
    bd = jax.device_put(batch_to_device_dict(batch), batch_shardings(mesh))
    with mesh:
        t0 = time.time()
        state, m = step_fn(state, bd)
        loss0 = float(m["loss"])
        compile_s = time.time() - t0
        t0 = time.time()
        steps = 3
        for _ in range(steps):
            state, m = step_fn(state, bd)
        loss = float(m["loss"])
        dt = (time.time() - t0) / steps
    assert np.isfinite(loss), loss
    audio = args.batch * args.frames / 100.0
    print(json.dumps({
        "preset": cfg.name, "hidden": cfg.model.hidden_dim,
        "batch": args.batch, "frames": args.frames,
        "compile_s": round(compile_s, 1), "step_ms": round(dt * 1e3, 1),
        "audio_s_per_s": round(audio / dt, 1),
        "loss0": round(loss0, 3), "loss": round(loss, 3),
        "device": jax.devices()[0].device_kind,
    }), flush=True)


def cmd_tp_dryrun(cfg, args):
    """Full TP train step at REAL width (H unchanged) on a virtual CPU
    mesh with the preset's shipped model-axis size."""
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from tpu_ctc.config import DataConfig, MeshConfig
    from tpu_ctc.data.bucketing import make_batch
    from tpu_ctc.parallel.mesh import make_mesh
    from tpu_ctc.train.loop import batch_to_device_dict
    from tpu_ctc.train.step import create_train_state, make_train_step

    tp = max(cfg.mesh.model, 2)
    assert jax.device_count() >= tp, (
        f"need >= {tp} devices; run under XLA_FLAGS="
        f"--xla_force_host_platform_device_count={tp} JAX_PLATFORMS=cpu")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(batch_size=args.batch, max_frames=args.frames,
                        bucket_boundaries=(args.frames,)),
        mesh=MeshConfig(data=1, model=tp, seq=1))
    rng = np.random.RandomState(0)
    utts = [(rng.randn(args.frames, cfg.model.input_dim).astype(np.float32),
             rng.randint(1, cfg.model.vocab_size, 4).astype(np.int32))
            for _ in range(args.batch)]
    batch = make_batch(utts, t_pad=args.frames, l_pad=8,
                       batch_size=args.batch)
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:tp])
    state = create_train_state(cfg)
    step_fn, state = make_train_step(cfg, mesh, state)
    t0 = time.time()
    with mesh:
        state, m = step_fn(state, batch_to_device_dict(batch))
    loss = float(m["loss"])
    assert np.isfinite(loss), loss
    print(json.dumps({
        "preset": cfg.name, "hidden": cfg.model.hidden_dim, "tp": tp,
        "frames": args.frames, "batch": args.batch,
        "loss": round(loss, 3), "wall_s": round(time.time() - t0, 1),
        "platform": jax.devices()[0].platform,
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="5")
    p.add_argument("--budget", action="store_true")
    p.add_argument("--step", action="store_true")
    p.add_argument("--tp-dryrun", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=400)
    args = p.parse_args()

    from tpu_ctc.config import get_config
    cfg = get_config(args.preset)
    if args.budget or not (args.step or args.tp_dryrun):
        cmd_budget(cfg, args)
    if args.step:
        cmd_step(cfg, args)
    if args.tp_dryrun:
        cmd_tp_dryrun(cfg, args)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
