"""Deterministic synthetic corpus for tests and benchmarks.

The reference's determinism story was "run TIMIT and watch CER drop"
(SURVEY.md §4.1); here we provide fixed-PRNG synthetic utterances
(SURVEY.md §4.2 "Determinism fixtures") in two modes:

  * feature mode — each character maps to a distinct feature-space
    template repeated over a few frames plus noise; a learnable toy task
    for end-to-end convergence tests without any audio.
  * audio mode — each character maps to a pure tone; exercises the
    STFT/log-mel frontend end-to-end.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from tpu_ctc.data.alphabet import Alphabet, DEFAULT_ALPHABET


class SyntheticCorpus:
    """Generates (features [T, D], label ids [L]) utterances deterministically."""

    def __init__(self,
                 num_utterances: int = 256,
                 feature_dim: int = 40,
                 frames_per_char: int = 8,
                 min_chars: int = 2,
                 max_chars: int = 12,
                 noise: float = 0.3,
                 alphabet: Alphabet = DEFAULT_ALPHABET,
                 seed: int = 0):
        self.alphabet = alphabet
        self.feature_dim = feature_dim
        self.frames_per_char = frames_per_char
        self.noise = noise
        self.seed = seed
        rng = np.random.RandomState(seed)
        # One fixed template per character class (excluding blank).
        self.templates = rng.randn(alphabet.size, feature_dim).astype(np.float32)
        self._lens = rng.randint(min_chars, max_chars + 1, size=num_utterances)
        self._labels: List[np.ndarray] = [
            rng.randint(1, alphabet.size, size=n).astype(np.int32)
            for n in self._lens
        ]
        self.num_utterances = num_utterances

    def __len__(self) -> int:
        return self.num_utterances

    def utterance(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        labels = self._labels[i]
        rng = np.random.RandomState(self.seed * 100003 + i)
        frames = np.repeat(self.templates[labels], self.frames_per_char, axis=0)
        feats = frames + self.noise * rng.randn(*frames.shape).astype(np.float32)
        return feats.astype(np.float32), labels

    def all_utterances(self):
        return [self.utterance(i) for i in range(len(self))]


def synthetic_audio_batch(batch_size: int,
                          num_samples: int,
                          sample_rate: int = 16000,
                          min_chars: int = 2,
                          max_chars: int = 8,
                          alphabet: Alphabet = DEFAULT_ALPHABET,
                          seed: int = 0,
                          samples_per_char: Optional[int] = None):
    """Waveform batch where each character is a pure tone.

    Returns (audio [B, N] float32, sample_lengths [B], labels [B, Lmax],
    label_lengths [B]).
    """
    rng = np.random.RandomState(seed)
    if samples_per_char is None:
        samples_per_char = sample_rate // 8
    freqs = 200.0 + 80.0 * np.arange(alphabet.size)     # one tone per char id
    audio = np.zeros((batch_size, num_samples), dtype=np.float32)
    lens = rng.randint(min_chars, max_chars + 1, size=batch_size)
    lmax = int(lens.max())
    labels = np.zeros((batch_size, lmax), dtype=np.int32)
    label_lengths = lens.astype(np.int32)
    sample_lengths = np.zeros(batch_size, dtype=np.int32)
    t = np.arange(samples_per_char) / sample_rate
    for b in range(batch_size):
        ids = rng.randint(1, alphabet.size, size=lens[b])
        labels[b, :lens[b]] = ids
        pos = 0
        for c in ids:
            seg = np.sin(2 * np.pi * freqs[c] * t).astype(np.float32)
            end = min(pos + samples_per_char, num_samples)
            audio[b, pos:end] = seg[: end - pos]
            pos = end
        sample_lengths[b] = pos
        audio[b] += 0.01 * rng.randn(num_samples).astype(np.float32)
    return audio, sample_lengths, labels, label_lengths
