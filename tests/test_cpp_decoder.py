"""Native C++ decoder parity vs the Python host reference and the
on-device decoder (SURVEY.md §4.2: "on-device batched decoder vs host
C++/Python reference decoder")."""
import numpy as np
import pytest

from tpu_ctc.decode import cpp_decoder
from tpu_ctc.decode.beam import prefix_beam_search_host
from tpu_ctc.decode.lm import train_ngram_lm

pytestmark = pytest.mark.skipif(not cpp_decoder.available(),
                                reason="libctcbeam.so not built")


def np_log_softmax(x):
    m = x.max(axis=-1, keepdims=True)
    e = x - m
    return e - np.log(np.exp(e).sum(axis=-1, keepdims=True))


class TestCppParity:
    def test_no_lm(self, rng):
        for trial in range(5):
            t, a, k = rng.randint(5, 20), rng.randint(3, 8), 8
            log_probs = np_log_softmax(rng.randn(t, a).astype(np.float32) * 1.5)
            py_best, py_score = prefix_beam_search_host(log_probs,
                                                        beam_width=k)
            c_best, c_score = cpp_decoder.beam_search(log_probs,
                                                      beam_width=k)
            assert c_best == py_best, (trial, c_best, py_best)
            np.testing.assert_allclose(c_score, py_score, rtol=1e-5)

    def test_with_trigram_lm(self, rng):
        t, a, k = 12, 5, 8
        seqs = [rng.randint(1, a, rng.randint(3, 10)) for _ in range(40)]
        lm = train_ngram_lm(seqs, vocab_size=a, order=3)
        log_probs = np_log_softmax(rng.randn(t, a).astype(np.float32) * 1.5)
        py_best, py_score = prefix_beam_search_host(
            log_probs, beam_width=k, lm=lm, lm_alpha=0.8, lm_beta=0.4)
        c_best, c_score = cpp_decoder.beam_search(
            log_probs, beam_width=k, lm=lm, lm_alpha=0.8, lm_beta=0.4)
        assert c_best == py_best
        np.testing.assert_allclose(c_score, py_score, rtol=1e-5)

    def test_batch(self, rng):
        b, t, a, k = 3, 10, 5, 8
        log_probs = np_log_softmax(rng.randn(b, t, a).astype(np.float32))
        lengths = np.array([10, 6, 3], np.int32)
        hyps, lens, scores = cpp_decoder.beam_search_batch(
            log_probs, lengths, beam_width=k)
        for i in range(b):
            py_best, py_score = prefix_beam_search_host(
                log_probs[i], length=int(lengths[i]), beam_width=k)
            assert list(hyps[i][: lens[i]]) == py_best
            np.testing.assert_allclose(float(scores[i]), py_score, rtol=1e-5)
