"""Edit distance / CER / WER tests, incl. the on-device batched DP
(SURVEY C11)."""
import jax.numpy as jnp
import numpy as np

from tpu_ctc.decode.wer import (batched_edit_distance, cer, edit_distance,
                                wer)


def brute_levenshtein(a, b):
    """Textbook quadratic DP, the oracle."""
    n, m = len(a), len(b)
    d = np.zeros((n + 1, m + 1), np.int64)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[n, m])


class TestHostEditDistance:
    def test_known(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance("", "abc") == 3
        assert edit_distance("abc", "") == 3
        assert edit_distance("abc", "abc") == 0

    def test_random_vs_oracle(self, rng):
        for _ in range(30):
            a = list(rng.randint(0, 4, rng.randint(0, 12)))
            b = list(rng.randint(0, 4, rng.randint(0, 12)))
            assert edit_distance(a, b) == brute_levenshtein(a, b)

    def test_wer(self):
        assert wer(["the cat sat"], ["the cat sat"]) == 0.0
        assert wer(["the cat sat"], ["the bat sat"]) == 1 / 3
        assert cer(["abc"], ["axc"]) == 1 / 3


class TestBatchedEditDistance:
    def test_vs_oracle(self, rng):
        B, N, M = 6, 10, 12
        refs = rng.randint(1, 5, (B, N)).astype(np.int32)
        hyps = rng.randint(1, 5, (B, M)).astype(np.int32)
        rl = rng.randint(0, N + 1, B).astype(np.int32)
        hl = rng.randint(0, M + 1, B).astype(np.int32)
        got = np.asarray(batched_edit_distance(
            jnp.asarray(refs), jnp.asarray(rl),
            jnp.asarray(hyps), jnp.asarray(hl)))
        for b in range(B):
            want = brute_levenshtein(list(refs[b, :rl[b]]),
                                     list(hyps[b, :hl[b]]))
            assert got[b] == want, (b, got[b], want)
