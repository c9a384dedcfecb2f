"""ctypes wrapper for the native C++ prefix beam-search decoder.

The reference shipped its decoders as compiled Cython (SURVEY.md C9); this
framework's native host decoder is ``cpp/ctc_beam.cpp`` (same exact
algorithm as :func:`tpu_ctc.decode.beam.prefix_beam_search_host`), built to
``cpp/libctcbeam.so`` and loaded here via ctypes (pybind11 is not in this
toolchain).  If the library is missing, :func:`available` is False and
callers fall back to the Python/JAX implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from tpu_ctc.decode.lm import NGramCharLM

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cpp")
_LIB_PATH = os.path.join(_LIB_DIR, "libctcbeam.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library with make; returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _LIB_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.ctc_beam_search_batch.restype = ctypes.c_int
    lib.ctc_beam_search_batch.argtypes = [
        f32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, i32p, i32p, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def beam_search_batch(log_probs: np.ndarray,
                      lengths: np.ndarray,
                      beam_width: int = 64,
                      blank: int = 0,
                      lm: Optional[NGramCharLM] = None,
                      lm_alpha: float = 1.0,
                      lm_beta: float = 0.0,
                      max_len: int = 128
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a [B, T, A] batch on the host with the native decoder.

    Returns (hyps [B, max_len] int32, lens [B] int32, scores [B] f32).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libctcbeam.so not built (run make -C cpp)")
    log_probs = np.ascontiguousarray(log_probs, dtype=np.float32)
    b, t, a = log_probs.shape
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    out_ids = np.zeros((b, max_len), dtype=np.int32)
    out_lens = np.zeros(b, dtype=np.int32)
    out_scores = np.zeros(b, dtype=np.float32)
    if lm is not None:
        table = np.ascontiguousarray(lm.logp, dtype=np.float32)
        table_p = table.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        order = lm.order
    else:
        table_p, order = None, 0
    rc = lib.ctc_beam_search_batch(
        log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b, t, a, beam_width, blank, table_p, order,
        ctypes.c_float(lm_alpha), ctypes.c_float(lm_beta), max_len,
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"ctc_beam_search_batch failed with code {rc}")
    return out_ids, out_lens, out_scores


def beam_search(log_probs: np.ndarray, **kw) -> Tuple[List[int], float]:
    """Single-utterance convenience wrapper."""
    hyps, lens, scores = beam_search_batch(
        log_probs[None], np.array([log_probs.shape[0]], np.int32), **kw)
    return list(hyps[0][: lens[0]]), float(scores[0])
