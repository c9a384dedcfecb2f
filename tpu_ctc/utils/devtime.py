"""Device-time measurement via the jax profiler.

On this TPU tunnel, wall-clock micro-benchmarks are unreliable:
``jax.block_until_ready`` can return before queued executions finish, and
a host fetch (the only true sync) costs 10-30 ms of HTTP latency with
high variance — either error dwarfs a sub-millisecond kernel.  The
profiler's device trace is honest, so kernel benchmarks read execution
time straight from it.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile

import jax
import numpy as np


def _device_exec_ms(trace_dir: str) -> float:
    """Sum device-side top-level jit execution durations (ms) in a trace.

    Events are attributed by the trace's *process track*: only events on
    pids whose ``process_name`` metadata names a device (``/device:`` or
    ``TPU``) are counted, so host-side events that happen to carry a
    jit-prefixed name can't be double-counted.  Falls back to the name
    heuristic only if the trace has no device track metadata.
    """
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    total_us = 0.0
    for path in paths:
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        dev_pids = set()
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pname = str(e.get("args", {}).get("name", ""))
                if "/device:" in pname or "TPU" in pname:
                    dev_pids.add(e.get("pid"))
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            name = e.get("name", "")
            on_device = (e.get("pid") in dev_pids) if dev_pids else True
            # Device executions are named jit_<fn>(<fingerprint>); host-side
            # dispatch shows as PjitFunction(...) and python frames as $...
            if (on_device and name.startswith("jit")
                    and not name.startswith("jit_convert")):
                total_us += e["dur"]
    return total_us / 1e3


def device_time_ms(fn, *args, iters: int = 10) -> float:
    """Average device execution time of ``fn(*args)`` in milliseconds.

    ``fn`` should be jitted; it is run once for warmup/compile, then
    ``iters`` times inside a profiler trace whose device events are
    summed.  Includes every jit executable the call launches (host
    callbacks and transfers excluded).
    """
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]   # true sync (fetch)
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        jax.profiler.stop_trace()
        return _device_exec_ms(td) / iters
