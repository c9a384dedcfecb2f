"""STFT → log-mel filterbank frontend, fully in-framework.

Replaces the reference's external Kaldi ``compute-fbank`` pipelines
(SURVEY.md C12/C13, §3.4) with jit-compatible jnp ops: framing, Hann window,
rFFT power spectrum, mel filterbank matmul (MXU-friendly), log compression,
per-utterance CMVN, and the reference dataLoader's +/-k context-frame
stacking (SURVEY.md C7).

All functions are pure, static-shape, and batchable; they run on TPU under
jit and on CPU for the numpy-feature path of BASELINE config 1.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ctc.config import FrontendConfig


def hann_window(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches common STFT conventions)."""
    n = jnp.arange(length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / length)


def num_frames(num_samples: int, cfg: FrontendConfig) -> int:
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.hop_length


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``x [..., N]`` into overlapping frames ``[..., T, frame_length]``."""
    n = x.shape[-1]
    t = 1 + (n - frame_length) // hop_length
    idx = (jnp.arange(t)[:, None] * hop_length + jnp.arange(frame_length)[None, :])
    return x[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_conv_kernels(frame_length: int, n_fft: int) -> np.ndarray:
    """Windowed real-DFT as conv kernels: [2*(n_fft//2+1), 1, frame_length].

    Framing + Hann window + real DFT collapse into ONE strided convolution
    (cos/-sin rows pre-multiplied by the window).  On TPU this is
    MXU-shaped work with no gather — XLA's gather lowering for explicit
    framing of long waveforms is pathologically slow to compile, and its
    FFT lowering is off the MXU entirely (BASELINE: "STFT/feature ...
    kernels at speed-of-light per chip").
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(frame_length)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_length)
                             / frame_length)
    mat = np.concatenate([np.cos(ang) * win[:, None],
                          -np.sin(ang) * win[:, None]], axis=1)
    return np.ascontiguousarray(mat.T[:, None, :]).astype(np.float32)


def stft_power(x: jnp.ndarray, cfg: FrontendConfig,
               use_fft: bool = False) -> jnp.ndarray:
    """Power spectrogram ``[..., T, n_fft//2 + 1]`` of ``x [..., N]``.

    Default path: one strided convolution with windowed cos/-sin kernels
    (see :func:`_dft_conv_kernels`); ``use_fft=True`` keeps the explicit
    framing + ``jnp.fft.rfft`` lowering for cross-checking.
    """
    if use_fft:
        frames = frame_signal(x, cfg.frame_length, cfg.hop_length)
        frames = frames * hann_window(cfg.frame_length, frames.dtype)
        spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
        return jnp.square(spec.real) + jnp.square(spec.imag)
    if cfg.frame_length > cfg.n_fft:
        raise ValueError("frame_length > n_fft requires the fft path")
    n_bins = cfg.n_fft // 2 + 1
    kern = jnp.asarray(_dft_conv_kernels(cfg.frame_length, cfg.n_fft))
    lead = x.shape[:-1]
    x2 = x.reshape((-1, 1, x.shape[-1]))
    ri = jax.lax.conv_general_dilated(
        x2.astype(jnp.float32), kern, window_strides=(cfg.hop_length,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    ri = jnp.moveaxis(ri, 1, 2)                  # [B, T, 2*bins]
    ri = ri.reshape(lead + ri.shape[1:])
    return jnp.square(ri[..., :n_bins]) + jnp.square(ri[..., n_bins:])


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: Optional[float]) -> np.ndarray:
    """Triangular mel filterbank matrix ``[n_fft//2+1, n_mels]`` (HTK mel scale).

    Built host-side in float64 numpy (it is a compile-time constant), then
    used as an MXU matmul against the power spectrogram.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bin_freqs = np.arange(n_bins) * (sample_rate / n_fft)
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - bin_freqs) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def log_mel(x: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Waveform ``[..., N]`` → log-mel features ``[..., T, n_mels]``."""
    power = stft_power(x, cfg)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                    cfg.fmin, cfg.fmax))
    mel = jnp.einsum("...tf,fm->...tm", power, fb)
    return jnp.log(jnp.maximum(mel, cfg.log_floor))


def cmvn(feats: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
         eps: float = 1e-8) -> jnp.ndarray:
    """Per-utterance cepstral mean/variance normalization over valid frames.

    ``feats [..., T, D]``; ``mask [..., T]`` marks valid frames (1.0) vs
    padding (0.0).  Padded frames are zeroed on output.
    """
    if mask is None:
        mean = jnp.mean(feats, axis=-2, keepdims=True)
        var = jnp.mean(jnp.square(feats - mean), axis=-2, keepdims=True)
        return (feats - mean) * jax.lax.rsqrt(var + eps)
    m = mask[..., :, None].astype(feats.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(feats * m, axis=-2, keepdims=True) / denom
    var = jnp.sum(jnp.square(feats - mean) * m, axis=-2, keepdims=True) / denom
    return (feats - mean) * jax.lax.rsqrt(var + eps) * m


def stack_context(feats: jnp.ndarray, context: int) -> jnp.ndarray:
    """Concatenate +/-context frames: ``[..., T, D] → [..., T, D*(2k+1)]``.

    Edge frames are edge-padded, mirroring the reference dataLoader's
    context stacking (SURVEY.md C7).
    """
    if context == 0:
        return feats
    shifts = []
    for k in range(-context, context + 1):
        if k < 0:
            pad = jnp.repeat(feats[..., :1, :], -k, axis=-2)
            shifted = jnp.concatenate([pad, feats[..., :k, :]], axis=-2)
        elif k > 0:
            pad = jnp.repeat(feats[..., -1:, :], k, axis=-2)
            shifted = jnp.concatenate([feats[..., k:, :], pad], axis=-2)
        else:
            shifted = feats
        shifts.append(shifted)
    return jnp.concatenate(shifts, axis=-1)


def extract_features(x: jnp.ndarray, cfg: FrontendConfig,
                     sample_lengths: Optional[jnp.ndarray] = None,
                     dither_key: Optional[jax.Array] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full frontend: waveform batch ``[B, N]`` → ``(feats [B, T, F], frame_mask [B, T])``.

    ``sample_lengths [B]`` gives valid samples per utterance; frames whose
    window extends past the valid length are masked out.  With
    ``cfg.dither > 0``, Gaussian noise of that stddev is added first —
    callers should pass a per-batch/per-utterance ``dither_key`` (the
    manifest loader derives one from the utterance index) so noise is
    decorrelated across utterances; when omitted a fixed key keeps runs
    reproducible but repeats one noise pattern.  With
    ``cfg.preemphasis > 0`` the waveform is pre-emphasized (see
    FrontendConfig / PARITY.md for the deltas vs Kaldi's per-frame
    variant).
    """
    if cfg.dither > 0.0:
        key = dither_key if dither_key is not None else jax.random.PRNGKey(0)
        x = x + cfg.dither * jax.random.normal(key, x.shape, jnp.float32)
    if cfg.preemphasis > 0.0:
        prev = jnp.pad(x[..., :-1],
                       [(0, 0)] * (x.ndim - 1) + [(1, 0)])
        x = x - cfg.preemphasis * prev
    feats = log_mel(x, cfg)
    t = feats.shape[-2]
    if sample_lengths is None:
        mask = jnp.ones(feats.shape[:-1], dtype=jnp.float32)
    else:
        n_valid = jnp.where(
            sample_lengths >= cfg.frame_length,
            1 + (sample_lengths - cfg.frame_length) // cfg.hop_length, 0)
        mask = (jnp.arange(t)[None, :] < n_valid[..., None]).astype(jnp.float32)
        feats = feats * mask[..., None]
    if cfg.cmvn:
        feats = cmvn(feats, mask)
    feats = stack_context(feats, cfg.context)
    feats = feats * mask[..., None]
    if cfg.frame_stride > 1:
        feats = feats[..., ::cfg.frame_stride, :]
        mask = mask[..., ::cfg.frame_stride]
    return feats, mask


def frame_lengths_from_samples(sample_lengths: np.ndarray,
                               cfg: FrontendConfig) -> np.ndarray:
    """Host-side helper: valid frame count per utterance."""
    sl = np.asarray(sample_lengths)
    return np.where(sl >= cfg.frame_length,
                    1 + (sl - cfg.frame_length) // cfg.hop_length, 0)
