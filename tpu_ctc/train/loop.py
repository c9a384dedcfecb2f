"""Training loop: epochs over bucketed batches, metrics, checkpoints, eval.

Reference equivalent: the epoch loop of ``sgd.py`` + ``runNNet.py``
(SURVEY.md C5/C14) — per-epoch shuffling, periodic cost prints, pickled
weight snapshots.  TPU-native changes: one jit-compiled step per bucket
shape (compiled once, cached), structured JSONL metrics (SURVEY.md §5
"Metrics/logging"), Orbax checkpointing of the FULL train state including
optimizer state, step and data cursor (the reference lost all of that on a
crash — SURVEY.md §5 "Failure detection"), and on-device greedy CER eval.
"""
from __future__ import annotations

import json
import os
import signal
import threading
import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from tpu_ctc.config import Config
from tpu_ctc.data.bucketing import Batch, BucketedLoader
from tpu_ctc.decode.wer import cer
from tpu_ctc.parallel.mesh import make_mesh
from tpu_ctc.train import checkpoint as ckpt_lib
from tpu_ctc.train.step import (TrainState, create_train_state,
                                make_eval_step, make_train_step)


class MetricsLogger:
    """Structured JSONL metrics writer (one line per event)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._f = open(path, "a") if path else None

    def log(self, **event):
        event.setdefault("time", time.time())
        if self._f:
            self._f.write(json.dumps(event) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


class PreemptionGuard:
    """Graceful-preemption handling (SURVEY.md §5 "Failure detection").

    On SIGTERM/SIGINT (the TPU-preemption notice) a flag is set; the train
    loop checks it each step, writes a final checkpoint with the exact data
    cursor, and exits cleanly — restart-from-latest resumes mid-epoch.
    Signal handlers only install on the main thread; elsewhere the guard is
    inert (tests, notebook workers).
    """

    def __init__(self, enable: bool = True):
        self.requested = False
        self._prev = {}
        if enable and threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    self._prev[sig] = signal.signal(sig, self._handler)
                except (ValueError, OSError):
                    pass

    def _handler(self, signum, frame):
        self.requested = True

    def restore(self):
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass


def batch_to_device_dict(batch: Batch) -> Dict[str, np.ndarray]:
    return {
        "feats": batch.feats, "frame_mask": batch.frame_mask,
        "frame_lengths": batch.frame_lengths, "labels": batch.labels,
        "label_lengths": batch.label_lengths, "weights": batch.weights,
    }


def evaluate(params, cfg: Config, loader: BucketedLoader, eval_step,
             alphabet=None, max_batches: Optional[int] = None,
             beam_decode_fn=None) -> Dict[str, float]:
    """Greedy-decode CER + mean NLL over an eval set.

    With ``beam_decode_fn`` (train.eval_beam), additionally runs the
    on-device prefix beam search and reports corpus WER/CER over the
    decoded text — the full offline eval job (SURVEY.md C13) inline.
    """
    from tpu_ctc.data.alphabet import DEFAULT_ALPHABET
    from tpu_ctc.decode.wer import score_corpus
    alphabet = alphabet or DEFAULT_ALPHABET
    refs, hyps, nlls, n = [], [], [], 0
    ref_texts, beam_texts = {}, {}
    for i, (_, batch) in enumerate(loader.epoch(0)):
        if max_batches is not None and i >= max_batches:
            break
        bd = batch_to_device_dict(batch)
        out = eval_step(params, bd)
        hyp = np.asarray(out["hyp"])
        hyp_len = np.asarray(out["hyp_len"])
        nll = np.asarray(out["nll"])
        if beam_decode_fn is not None:
            b_hyp, b_len = beam_decode_fn(params, bd)
            b_hyp, b_len = np.asarray(b_hyp), np.asarray(b_len)
        for b in range(len(hyp)):
            if batch.weights[b] > 0:
                ref_ids = batch.labels[b][: batch.label_lengths[b]]
                refs.append(list(ref_ids))
                hyps.append(list(hyp[b][: hyp_len[b]]))
                nlls.append(float(nll[b]))
                if beam_decode_fn is not None:
                    utt = f"e{i}b{b}"
                    ref_texts[utt] = alphabet.decode(ref_ids)
                    beam_texts[utt] = alphabet.decode(b_hyp[b][: b_len[b]])
                n += 1
    result = {"cer": cer(refs, hyps),
              "nll": float(np.mean(nlls)) if nlls else 0.0, "num_utts": n}
    if beam_decode_fn is not None and ref_texts:
        totals, _ = score_corpus(ref_texts, beam_texts, "word")
        c_totals, _ = score_corpus(ref_texts, beam_texts, "char")
        result.update(beam_wer=totals["error_rate"],
                      beam_cer=c_totals["error_rate"])
    return result


def train(cfg: Config,
          train_data: Sequence[Tuple[np.ndarray, np.ndarray]],
          eval_data: Optional[Sequence[Tuple[np.ndarray, np.ndarray]]] = None,
          mesh=None,
          work_dir: Optional[str] = None,
          resume: bool = False,
          alphabet=None) -> Tuple[TrainState, Dict[str, float]]:
    """Run the full training job; returns (final host-side state, last metrics)."""
    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if mesh is None:
        mesh = make_mesh(cfg.mesh)
    host_id = jax.process_index()
    num_hosts = jax.process_count()
    loader = BucketedLoader(train_data, cfg.data, host_id, num_hosts)
    eval_loader = (BucketedLoader(eval_data, cfg.data) if eval_data is not None
                   else None)
    if loader.num_dropped:
        print(f"[data] dropped {loader.num_dropped} utterances longer than "
              f"{cfg.data.bucket_boundaries[-1]} frames")

    work_dir = work_dir or "."
    os.makedirs(work_dir, exist_ok=True)
    metrics_path = (os.path.join(work_dir, cfg.train.metrics_path)
                    if cfg.train.metrics_path else None)
    logger = MetricsLogger(metrics_path if host_id == 0 else None)
    ckpt_dir = os.path.join(work_dir, cfg.train.checkpoint_dir)
    manager = ckpt_lib.make_manager(ckpt_dir, cfg.train.keep_checkpoints)

    state = create_train_state(cfg)
    start_epoch, start_batch = 0, 0
    if resume:
        restored = ckpt_lib.restore(manager, state)
        if restored is not None:
            state, start_epoch, start_batch = restored
            print(f"[ckpt] resumed at epoch {start_epoch} batch {start_batch} "
                  f"step {int(state.step)}")

    step_fn, state = make_train_step(cfg, mesh, state)
    eval_step = make_eval_step(cfg, mesh)
    beam_decode_fn = None
    if cfg.train.eval_beam and eval_loader is not None:
        from tpu_ctc.decode.beam import make_beam_decoder
        from tpu_ctc.decode.lm import train_char_lm_from_data
        lm = (train_char_lm_from_data(train_data, cfg)
              if cfg.decode.lm_order else None)
        beam_decode_fn = make_beam_decoder(cfg, lm=lm)

    last_metrics: Dict[str, float] = {}
    t_start = time.time()
    audio_s_acc, t_acc = 0.0, 0.0
    from tpu_ctc.data.prefetch import prefetch_to_device
    from tpu_ctc.train.step import batch_shardings
    b_sh = batch_shardings(mesh)

    guard = PreemptionGuard()
    with mesh:
        # Track the step count host-side: fetching int(state.step) per step
        # is a device->host scalar read that costs 10-30 ms of tunnel
        # latency each — it dominated small-model step time.
        step = int(state.step)
        t_win, audio_win, steps_win = time.time(), 0.0, 0
        for epoch in range(start_epoch, cfg.train.num_epochs):
            sb = start_batch if epoch == start_epoch else 0
            for cursor, batch, dev_batch in prefetch_to_device(
                    loader.epoch(epoch, sb), b_sh):
                if guard.requested:
                    ckpt_lib.save(manager, state, epoch, cursor, force=True)
                    manager.wait_until_finished()
                    logger.log(kind="preempted", epoch=epoch, cursor=cursor,
                               step=step)
                    logger.close()
                    guard.restore()
                    print(f"[preempt] checkpointed at step {step} "
                          f"(epoch {epoch}, batch {cursor}); exiting")
                    return state, last_metrics
                state, m = step_fn(state, dev_batch)
                step += 1
                audio_win += batch.audio_seconds()
                steps_win += 1
                if step % cfg.train.log_every == 0:
                    # Window-averaged timing: the float() fetches below are
                    # the loop's only host syncs, so the window wall-clock
                    # amortizes their latency over log_every steps.
                    m = {k: float(v) for k, v in m.items()}
                    dt = time.time() - t_win
                    m.update(step=step, epoch=epoch,
                             audio_s_per_s=audio_win / max(dt, 1e-9),
                             step_time_s=dt / max(steps_win, 1))
                    logger.log(kind="train", **m)
                    last_metrics = m
                    t_win, audio_win, steps_win = time.time(), 0.0, 0
                if cfg.train.checkpoint_every and \
                        step % cfg.train.checkpoint_every == 0:
                    t0 = time.time()
                    ckpt_lib.save(manager, state, epoch, cursor + 1)
                    t_win += time.time() - t0     # exclude save from window
                if (eval_loader is not None and cfg.train.eval_every
                        and step % cfg.train.eval_every == 0):
                    t0 = time.time()
                    ev = evaluate(state.params, cfg, eval_loader, eval_step,
                                  alphabet=alphabet,
                                  beam_decode_fn=beam_decode_fn)
                    logger.log(kind="eval", step=step, **ev)
                    t_win += time.time() - t0     # exclude eval from window
            logger.log(kind="epoch_end", epoch=epoch,
                       wall_s=time.time() - t_start)
    guard.restore()
    ckpt_lib.save(manager, state, cfg.train.num_epochs, 0, force=True)
    manager.wait_until_finished()
    logger.close()
    return state, last_metrics
