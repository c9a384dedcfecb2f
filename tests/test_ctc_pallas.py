"""Pallas CTC kernel parity vs the jnp scan reference and torch oracle.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel code
compiles via Mosaic on a real TPU (exercised by bench_ctc.py / the driver's
TPU bench).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ctc.losses import ctc_ref
from tpu_ctc.ops import ctc_pallas

DATA = os.path.join(os.path.dirname(__file__), "data")


def rand_case(rng, b, t, a, lmax):
    logits = rng.randn(b, t, a).astype(np.float32)
    labels = rng.randint(1, a, (b, lmax)).astype(np.int32)
    tl = rng.randint(max(2 * lmax + 1, 2), t + 1, b).astype(np.int32)
    ll = rng.randint(0, lmax + 1, b).astype(np.int32)
    return (jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(tl),
            jnp.asarray(ll))


class TestForwardParity:
    @pytest.mark.parametrize("b,t,a,lmax", [
        (2, 16, 6, 4), (3, 40, 29, 12), (1, 130, 8, 20), (9, 33, 5, 3)])
    def test_matches_jnp(self, rng, b, t, a, lmax):
        logits, labels, tl, ll = rand_case(rng, b, t, a, lmax)
        want = ctc_ref.ctc_loss(logits, labels, tl, ll)
        got = ctc_pallas.ctc_loss(logits, labels, tl, ll)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_force_q_must_divide_128(self, rng):
        """force_q values that don't divide 128 would build a
        non-lane-aligned packing plan — must fail loudly (advisor r4)."""
        logits, labels, tl, ll = rand_case(rng, 2, 16, 6, 4)
        lp = jax.nn.log_softmax(logits, -1)
        with pytest.raises(ValueError, match="divide 128"):
            ctc_pallas.ctc_loss_from_log_probs(lp, labels, tl, ll,
                                               force_q=3)

    def test_infeasible_clamped(self):
        logits = jnp.zeros((1, 2, 4))
        nll = ctc_pallas.ctc_loss(logits, jnp.array([[1, 2, 3]]),
                                  jnp.array([2]), jnp.array([3]))
        assert float(nll[0]) > 1e8

    def test_neg_inf_log_probs(self, rng):
        """-inf vocab entries (masked vocab / diverged logits) must not NaN
        the one-hot emission einsum (ADVICE r1: -inf * 0.0 = NaN)."""
        b, t, a, lmax = 2, 20, 8, 4
        logits, labels, tl, ll = rand_case(rng, b, t, a, lmax)
        labels = jnp.minimum(labels, a - 2)       # keep labels feasible
        lp = jax.nn.log_softmax(logits, axis=-1)
        lp = lp.at[:, :, a - 1].set(-np.inf)      # a masked vocab entry
        want = ctc_ref.ctc_loss_from_log_probs(lp, labels, tl, ll)
        got = ctc_pallas.ctc_loss_from_log_probs(lp, labels, tl, ll)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        assert np.all(np.isfinite(np.asarray(got)))

    def test_torch_oracle(self):
        d = np.load(os.path.join(DATA, "ctc_torch_oracle.npz"))
        for ci in range(int(d["num_cases"])):
            loss = ctc_pallas.ctc_loss(
                jnp.asarray(d[f"logits_{ci}"]), jnp.asarray(d[f"labels_{ci}"]),
                jnp.asarray(d[f"tl_{ci}"]), jnp.asarray(d[f"ll_{ci}"]))
            np.testing.assert_allclose(np.asarray(loss), d[f"loss_{ci}"],
                                       rtol=1e-4, atol=1e-4)


class TestGradParity:
    @pytest.mark.parametrize("b,t,a,lmax", [(2, 16, 6, 4), (3, 40, 12, 8)])
    def test_grad_matches_jnp(self, rng, b, t, a, lmax):
        logits, labels, tl, ll = rand_case(rng, b, t, a, lmax)

        def f_ref(x):
            return jnp.sum(ctc_ref.ctc_loss(x, labels, tl, ll))

        def f_pal(x):
            return jnp.sum(ctc_pallas.ctc_loss(x, labels, tl, ll))

        g_ref = jax.grad(f_ref)(logits)
        g_pal = jax.grad(f_pal)(logits)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_grad_torch_oracle(self):
        d = np.load(os.path.join(DATA, "ctc_torch_oracle.npz"))
        for ci in range(int(d["num_cases"])):
            labels = jnp.asarray(d[f"labels_{ci}"])
            tl = jnp.asarray(d[f"tl_{ci}"])
            ll = jnp.asarray(d[f"ll_{ci}"])
            g = jax.grad(lambda x: jnp.sum(ctc_pallas.ctc_loss(
                x, labels, tl, ll)))(jnp.asarray(d[f"logits_{ci}"]))
            np.testing.assert_allclose(np.asarray(g), d[f"grad_{ci}"],
                                       rtol=1e-3, atol=1e-4)

    def test_grad_zero_on_padding(self, rng):
        logits, labels, tl, ll = rand_case(rng, 2, 20, 6, 4)
        tl = jnp.array([12, 20])
        g = jax.grad(lambda x: jnp.sum(ctc_pallas.ctc_loss(
            x, labels, tl, ll)))(logits)
        np.testing.assert_allclose(np.asarray(g)[0, 12:], 0.0, atol=1e-6)


class TestDispatcher:
    def test_losses_ctc_impl_pallas(self, rng):
        from tpu_ctc.losses import ctc
        logits, labels, tl, ll = rand_case(rng, 2, 16, 6, 4)
        a = ctc.ctc_loss(logits, labels, tl, ll, impl="pallas")
        b = ctc.ctc_loss(logits, labels, tl, ll, impl="jnp")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)
