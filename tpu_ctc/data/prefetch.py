"""Async host->device batch prefetching.

The reference fed one utterance at a time synchronously (SURVEY.md §3.1's
host<->device boundary crossings).  Here batches are transferred to device
ahead of compute on a background thread, so the jit-compiled train step
never waits on PCIe/DCN: while step N runs, batch N+1 (and N+2, ...) are
already in flight.  ``jax.device_put`` is async by design — the thread just
issues the transfers early and the queue bounds memory.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Tuple

import jax


def prefetch_to_device(iterator: Iterator,
                       sharding,
                       size: int = 2,
                       to_device_dict: Optional[Callable] = None) -> Iterator:
    """Wrap an iterator of host batches; yield device-resident batches.

    ``iterator`` yields (cursor, Batch); ``sharding`` is a NamedSharding
    (or dict of them) for ``jax.device_put``.  ``size`` bounds the number
    of in-flight device batches.
    """
    if to_device_dict is None:
        from tpu_ctc.train.loop import batch_to_device_dict
        to_device_dict = batch_to_device_dict

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err: list = []

    def worker():
        try:
            for cursor, batch in iterator:
                dev = jax.device_put(to_device_dict(batch), sharding)
                q.put((cursor, batch, dev))
        except Exception as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
