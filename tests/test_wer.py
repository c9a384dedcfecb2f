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


class TestBootstrap:
    """Bootstrap CIs (VERDICT r4 item 2): utterance-resampling bands."""

    def _corpus(self, rng, n=40, err_every=4):
        refs, hyps = {}, {}
        for i in range(n):
            words = [f"w{rng.randint(50)}" for _ in range(5)]
            refs[f"u{i:03d}"] = " ".join(words)
            hyp = list(words)
            if i % err_every == 0:
                hyp[0] = "xx"                       # one sub per err utt
            hyps[f"u{i:03d}"] = " ".join(hyp)
        return refs, hyps

    def test_ci_brackets_point_estimate(self, rng):
        from tpu_ctc.decode.wer import bootstrap_ci, score_corpus
        refs, hyps = self._corpus(rng)
        totals, _ = score_corpus(refs, hyps, "word")
        lo, hi = bootstrap_ci(refs, hyps, "word", n_boot=500, seed=1)
        assert lo <= totals["error_rate"] <= hi
        assert 0.0 <= lo < hi <= 1.0
        # deterministic for a fixed seed
        assert (lo, hi) == bootstrap_ci(refs, hyps, "word", n_boot=500,
                                        seed=1)

    def test_paired_bootstrap_identical_systems_is_zero(self, rng):
        from tpu_ctc.decode.wer import paired_bootstrap
        refs, hyps = self._corpus(rng)
        d, lo, hi, p = paired_bootstrap(refs, hyps, hyps, "word",
                                        n_boot=200)
        assert d == 0.0 and lo == 0.0 and hi == 0.0

    def test_paired_bootstrap_detects_better_system(self, rng):
        from tpu_ctc.decode.wer import paired_bootstrap
        refs, hyps_bad = self._corpus(rng, err_every=2)
        hyps_good = dict(refs)               # perfect system on SAME refs
        # A=bad, B=good -> diff > 0, CI excludes 0, P(B better) ~ 1
        d, lo, hi, p = paired_bootstrap(refs, hyps_bad, hyps_good, "word",
                                        n_boot=500, seed=2)
        assert d > 0 and lo > 0
        assert p > 0.99
