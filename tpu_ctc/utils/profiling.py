"""Tracing/profiling subsystem.

Reference analogue: ``print`` of per-file cost and wall-time in the SGD
loop (SURVEY.md §5 "Tracing/profiling").  Here:

  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard/Perfetto trace directory for any code region.
  * :class:`StepTimer` — steady-state step timing with
    ``block_until_ready`` discipline (compile excluded), deriving the
    BASELINE metrics: audio-seconds/s/chip and step-time percentiles.
  * :func:`flops_estimate` — analytic FLOP count for the BiRNN train step,
    used to report model FLOP/s utilization (MFU) against the chip peak.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from tpu_ctc.config import Config

# bf16 peak of the chip this framework targets by default (TPU v5e).
TPU_V5E_BF16_PEAK_FLOPS = 197e12


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a region: view in TensorBoard/Perfetto/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times; reports throughput and percentiles."""

    def __init__(self, frames_per_second: float = 100.0):
        self.times: List[float] = []
        self.audio_s: List[float] = []
        self.fps = frames_per_second
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None, audio_seconds: float = 0.0):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.time() - self._t0)
        self.audio_s.append(audio_seconds)

    def summary(self, skip_first: int = 1) -> Dict[str, float]:
        ts = np.asarray(self.times[skip_first:] or self.times)
        au = np.asarray(self.audio_s[skip_first:] or self.audio_s)
        out = {
            "steps": len(ts),
            "step_time_mean_s": float(ts.mean()),
            "step_time_p50_s": float(np.percentile(ts, 50)),
            "step_time_p95_s": float(np.percentile(ts, 95)),
        }
        if au.sum() > 0:
            out["audio_s_per_s"] = float(au.sum() / ts.sum())
        return out


def flops_estimate(cfg: Config, batch: int, frames: int) -> float:
    """Analytic train-step FLOPs for the BiRNN stack (fwd ~ 1x, bwd ~ 2x).

    Per bidirectional layer: one shared input projection (2*B*T*D*H) plus
    two recurrent matmul chains (2 * 2*B*T*H*H).
    """
    m = cfg.model
    d = m.input_dim
    h = m.hidden_dim
    fwd = 0.0
    for _ in range(m.num_pre_layers):
        fwd += 2.0 * batch * frames * d * h
        d = h
    for _ in range(m.num_bi_layers):
        fwd += 2.0 * batch * frames * d * h      # shared projection
        fwd += 2 * 2.0 * batch * frames * h * h  # two directions
        d = h
    for _ in range(m.num_post_layers):
        fwd += 2.0 * batch * frames * h * h
    fwd += 2.0 * batch * frames * h * m.vocab_size
    return 3.0 * fwd                              # fwd + ~2x bwd


def mfu(cfg: Config, batch: int, frames: int, step_time_s: float,
        peak: float = TPU_V5E_BF16_PEAK_FLOPS) -> float:
    """Model FLOP/s utilization of one chip for a measured step time."""
    return flops_estimate(cfg, batch, frames) / step_time_s / peak
