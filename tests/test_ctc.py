"""CTC loss tests — the load-bearing oracle suite.

Mirrors the reference's ``ctc/test_ctc.py`` gradient check (SURVEY.md C2,
§4.1: "the only strong numeric test and it is the load-bearing one"), plus:
known-value tests on hand-enumerable lattices, a precomputed torch-CTC
oracle fixture (loss AND analytic gradient; torch runs in a separate
process because torch+jax in one process deadlocks in this environment),
and masking/batching invariances.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ctc.losses import ctc_ref

DATA = os.path.join(os.path.dirname(__file__), "data")


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestKnownValues:
    def test_t1_l1(self):
        # T=1, single label c: only path is (c); loss = -log p(c).
        logits = np.random.RandomState(0).randn(1, 1, 4).astype(np.float32)
        p = np_softmax(logits)[0, 0]
        loss = ctc_ref.ctc_loss(jnp.asarray(logits), jnp.array([[2]]),
                                jnp.array([1]), jnp.array([1]))
        np.testing.assert_allclose(float(loss[0]), -np.log(p[2]), rtol=1e-4)

    def test_t2_l1_enumeration(self):
        # T=2, label c: paths (c,c), (c,b), (b,c).
        logits = np.random.RandomState(1).randn(1, 2, 5).astype(np.float32)
        p = np_softmax(logits)[0]
        c = 3
        total = p[0, c] * p[1, c] + p[0, c] * p[1, 0] + p[0, 0] * p[1, c]
        loss = ctc_ref.ctc_loss(jnp.asarray(logits), jnp.array([[c]]),
                                jnp.array([2]), jnp.array([1]))
        np.testing.assert_allclose(float(loss[0]), -np.log(total), rtol=1e-4)

    def test_empty_label(self):
        # L=0: the only path is all blanks.
        logits = np.random.RandomState(2).randn(1, 4, 3).astype(np.float32)
        p = np_softmax(logits)[0]
        loss = ctc_ref.ctc_loss(jnp.asarray(logits),
                                jnp.zeros((1, 2), jnp.int32),
                                jnp.array([4]), jnp.array([0]))
        np.testing.assert_allclose(float(loss[0]), -np.log(p[:, 0]).sum(),
                                   rtol=1e-4)

    def test_repeated_label_needs_blank(self):
        # label (c, c) with T=2 is infeasible (needs blank between repeats):
        # loss should be the large clamped value.
        logits = np.zeros((1, 2, 4), dtype=np.float32)
        loss = ctc_ref.ctc_loss(jnp.asarray(logits), jnp.array([[1, 1]]),
                                jnp.array([2]), jnp.array([2]))
        assert float(loss[0]) > 1e8

    def test_infeasible_too_short(self):
        logits = np.zeros((1, 2, 4), dtype=np.float32)
        loss = ctc_ref.ctc_loss(jnp.asarray(logits), jnp.array([[1, 2, 3]]),
                                jnp.array([2]), jnp.array([3]))
        assert float(loss[0]) > 1e8


class TestTorchOracle:
    """Precomputed torch CTC loss + analytic grads (float64)."""

    @pytest.fixture(scope="class")
    def oracle(self):
        return np.load(os.path.join(DATA, "ctc_torch_oracle.npz"))

    def test_losses_and_grads(self, oracle):
        for ci in range(int(oracle["num_cases"])):
            logits = jnp.asarray(oracle[f"logits_{ci}"])
            labels = jnp.asarray(oracle[f"labels_{ci}"])
            tl = jnp.asarray(oracle[f"tl_{ci}"])
            ll = jnp.asarray(oracle[f"ll_{ci}"])

            def total(x):
                return jnp.sum(ctc_ref.ctc_loss(x, labels, tl, ll))

            loss = ctc_ref.ctc_loss(logits, labels, tl, ll)
            grad = jax.jit(jax.grad(total))(logits)
            np.testing.assert_allclose(np.asarray(loss), oracle[f"loss_{ci}"],
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(grad), oracle[f"grad_{ci}"],
                                       rtol=1e-3, atol=1e-4)
            assert bool(jnp.all(jnp.isfinite(grad)))


class TestGradCheck:
    def test_finite_differences(self):
        """The reference's own oracle (C2): FD check at small dims.

        float32 FD noise limits attainable precision; the tight analytic
        check is TestTorchOracle.  Here we verify directional derivatives.
        """
        rng = np.random.RandomState(3)
        B, T, A, L = 2, 8, 5, 3
        logits = rng.randn(B, T, A).astype(np.float32)
        labels = jnp.asarray(rng.randint(1, A, (B, L)).astype(np.int32))
        tl = jnp.array([8, 6])
        ll = jnp.array([3, 2])

        f = jax.jit(lambda x: jnp.sum(ctc_ref.ctc_loss(x, labels, tl, ll)))
        g = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(logits)))
        for i in range(5):
            d = rng.randn(*logits.shape).astype(np.float32)
            d /= np.linalg.norm(d)
            eps = 1e-2
            fd = (float(f(jnp.asarray(logits + eps * d)))
                  - float(f(jnp.asarray(logits - eps * d)))) / (2 * eps)
            np.testing.assert_allclose(fd, float((g * d).sum()),
                                       rtol=2e-2, atol=2e-3)


class TestInvariances:
    def test_time_padding_invariance(self):
        """Extra padded frames must not change the loss."""
        rng = np.random.RandomState(4)
        B, T, A, L = 2, 10, 6, 3
        logits = rng.randn(B, T, A).astype(np.float32)
        labels = jnp.asarray(rng.randint(1, A, (B, L)).astype(np.int32))
        tl = jnp.array([10, 7])
        ll = jnp.array([3, 2])
        base = ctc_ref.ctc_loss(jnp.asarray(logits), labels, tl, ll)
        padded = np.concatenate(
            [logits, rng.randn(B, 5, A).astype(np.float32)], axis=1)
        padded_loss = ctc_ref.ctc_loss(jnp.asarray(padded), labels, tl, ll)
        np.testing.assert_allclose(np.asarray(base), np.asarray(padded_loss),
                                   rtol=1e-4)

    def test_label_padding_invariance(self):
        rng = np.random.RandomState(5)
        B, T, A = 2, 10, 6
        logits = jnp.asarray(rng.randn(B, T, A).astype(np.float32))
        labels = rng.randint(1, A, (B, 3)).astype(np.int32)
        tl = jnp.array([10, 9])
        ll = jnp.array([3, 2])
        base = ctc_ref.ctc_loss(logits, jnp.asarray(labels), tl, ll)
        padded = np.concatenate(
            [labels, rng.randint(0, A, (B, 4)).astype(np.int32)], axis=1)
        padded_loss = ctc_ref.ctc_loss(logits, jnp.asarray(padded), tl, ll)
        np.testing.assert_allclose(np.asarray(base), np.asarray(padded_loss),
                                   rtol=1e-4)

    def test_batch_order_invariance(self):
        rng = np.random.RandomState(6)
        B, T, A, L = 4, 9, 5, 3
        logits = rng.randn(B, T, A).astype(np.float32)
        labels = rng.randint(1, A, (B, L)).astype(np.int32)
        tl = np.array([9, 8, 7, 6], np.int32)
        ll = np.array([3, 2, 1, 3], np.int32)
        base = np.asarray(ctc_ref.ctc_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(tl),
            jnp.asarray(ll)))
        perm = np.array([2, 0, 3, 1])
        out = np.asarray(ctc_ref.ctc_loss(
            jnp.asarray(logits[perm]), jnp.asarray(labels[perm]),
            jnp.asarray(tl[perm]), jnp.asarray(ll[perm])))
        np.testing.assert_allclose(out, base[perm], rtol=1e-4)

    def test_posteriors_sum_to_valid_frames(self):
        """Occupancy posteriors gamma sum to 1 per valid frame, 0 on padding."""
        rng = np.random.RandomState(7)
        B, T, A, L = 2, 8, 5, 3
        log_probs = jax.nn.log_softmax(
            jnp.asarray(rng.randn(B, T, A).astype(np.float32)), -1)
        labels = jnp.asarray(rng.randint(1, A, (B, L)).astype(np.int32))
        tl = jnp.array([8, 5])
        ll = jnp.array([3, 2])
        gamma = ctc_ref.ctc_alignment_posteriors(log_probs, labels, tl, ll)
        sums = np.asarray(jnp.sum(gamma, axis=-1))
        for b, t_valid in enumerate([8, 5]):
            np.testing.assert_allclose(sums[b, :t_valid], 1.0, atol=1e-4)
            np.testing.assert_allclose(sums[b, t_valid:], 0.0, atol=1e-5)
