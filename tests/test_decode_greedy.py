"""Greedy decoder tests: collapse semantics vs a Python oracle (SURVEY C8)."""
import jax.numpy as jnp
import numpy as np

from tpu_ctc.decode.greedy import collapse_ids, greedy_decode


def python_collapse(ids, blank=0):
    out, prev = [], None
    for i in ids:
        if i != blank and i != prev:
            out.append(i)
        prev = i
    return out


class TestCollapse:
    def test_matches_python_oracle(self, rng):
        for trial in range(20):
            t = rng.randint(1, 30)
            ids = rng.randint(0, 5, t).astype(np.int32)
            got, n = collapse_ids(jnp.asarray(ids[None]),
                                  jnp.ones((1, t)))
            want = python_collapse(list(ids))
            assert int(n[0]) == len(want)
            np.testing.assert_array_equal(np.asarray(got)[0, :len(want)], want)

    def test_respects_frame_mask(self):
        ids = np.array([[1, 1, 0, 2, 2, 3]], np.int32)
        mask = np.array([[1, 1, 1, 1, 0, 0]], np.float32)
        got, n = collapse_ids(jnp.asarray(ids), jnp.asarray(mask))
        assert int(n[0]) == 2
        np.testing.assert_array_equal(np.asarray(got)[0, :2], [1, 2])

    def test_repeat_after_blank_kept(self):
        ids = np.array([[1, 0, 1]], np.int32)
        got, n = collapse_ids(jnp.asarray(ids), jnp.ones((1, 3)))
        assert int(n[0]) == 2
        np.testing.assert_array_equal(np.asarray(got)[0, :2], [1, 1])

    def test_all_blank(self):
        ids = np.zeros((1, 5), np.int32)
        got, n = collapse_ids(jnp.asarray(ids), jnp.ones((1, 5)))
        assert int(n[0]) == 0

    def test_greedy_decode_from_log_probs(self, rng):
        B, T, A = 2, 6, 4
        lp = rng.randn(B, T, A).astype(np.float32)
        ids = lp.argmax(-1)
        got, n = greedy_decode(jnp.asarray(lp), jnp.ones((B, T)))
        for b in range(B):
            want = python_collapse(list(ids[b]))
            assert int(n[b]) == len(want)
            np.testing.assert_array_equal(
                np.asarray(got)[b, :len(want)], want)
