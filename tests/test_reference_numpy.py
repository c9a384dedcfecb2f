"""Cross-implementation parity: numpy reference stack vs the JAX stack.

The numpy module re-creates the reference's CPU path (prob-space CTC with
rescaling, per-utterance Python-loop BRNN, hand-written backprop).  Testing
it against the JAX implementations gives two independent derivations of
the same math agreeing — the strongest correctness evidence available
without the actual reference source (SURVEY.md provenance warning).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_ctc.bench.reference_numpy import (ReferenceBRNN, ctc_loss_numpy,
                                           softmax)
from tpu_ctc.config import ModelConfig
from tpu_ctc.losses import ctc_ref
from tpu_ctc.models import birnn


class TestNumpyCTCvsJnp:
    def test_loss_and_grad_match(self, rng):
        for trial in range(5):
            t = rng.randint(6, 20)
            a = rng.randint(4, 9)
            l = rng.randint(1, min(t // 2, 6) + 1)
            logits = rng.randn(t, a).astype(np.float64)
            labels = rng.randint(1, a, l)
            probs = softmax(logits, axis=1)
            nll_np, grad_np = ctc_loss_numpy(probs.T, labels)

            jl = jnp.asarray(logits[None].astype(np.float32))
            jlab = jnp.asarray(labels[None].astype(np.int32))
            nll_j = ctc_ref.ctc_loss(jl, jlab, jnp.array([t]), jnp.array([l]))
            g_j = jax.grad(lambda x: jnp.sum(ctc_ref.ctc_loss(
                x, jlab, jnp.array([t]), jnp.array([l]))))(jl)
            np.testing.assert_allclose(float(nll_j[0]), nll_np, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(g_j)[0], grad_np.T,
                                       rtol=1e-3, atol=1e-4)


class TestNumpyModelVsJax:
    def _params_from_ref(self, ref: ReferenceBRNN):
        conv = lambda d: {k: jnp.asarray(v.astype(np.float32))
                          for k, v in d.items()}
        return {"pre": [conv(l) for l in ref.pre],
                "bi": [conv(l) for l in ref.bi],
                "post": [],
                "out": conv(ref.out)}

    def test_forward_parity(self, rng):
        ref = ReferenceBRNN(input_dim=7, hidden_dim=12, vocab_size=9,
                            num_pre=1, num_bi=2, init_scale=0.1, seed=3)
        cfg = ModelConfig(input_dim=7, hidden_dim=12, num_pre_layers=1,
                          num_bi_layers=2, num_post_layers=0, vocab_size=9,
                          compute_dtype="float32")
        params = self._params_from_ref(ref)
        t = 15
        feats = rng.randn(t, 7).astype(np.float64)
        want = ref.forward(feats)                      # [T, A] posteriors
        logits = birnn.forward(params, cfg, jnp.asarray(
            feats[None].astype(np.float32)), jnp.ones((1, t)))
        got = np.asarray(jax.nn.softmax(logits[0], axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grad_parity_handwritten_vs_autodiff(self, rng):
        """The reference's hand-written backprop vs jax.grad — end to end
        through model AND CTC loss."""
        ref = ReferenceBRNN(input_dim=6, hidden_dim=10, vocab_size=8,
                            num_pre=1, num_bi=1, init_scale=0.1, seed=4)
        cfg = ModelConfig(input_dim=6, hidden_dim=10, num_pre_layers=1,
                          num_bi_layers=1, num_post_layers=0, vocab_size=8,
                          compute_dtype="float32")
        params = self._params_from_ref(ref)
        t, l = 12, 3
        feats = rng.randn(t, 6).astype(np.float64)
        labels = rng.randint(1, 8, l)

        nll_np, grads_np = ref.cost_and_grad(feats, labels)

        def loss_fn(p):
            logits = birnn.forward(p, cfg, jnp.asarray(
                feats[None].astype(np.float32)), jnp.ones((1, t)))
            return jnp.sum(ctc_ref.ctc_loss(
                logits, jnp.asarray(labels[None].astype(np.int32)),
                jnp.array([t]), jnp.array([l])))

        nll_j = float(loss_fn(params))
        g_j = jax.grad(loss_fn)(params)
        np.testing.assert_allclose(nll_j, nll_np, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_j["out"]["w"]), grads_np["out"]["w"],
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_j["bi"][0]["wf"]), grads_np["bi"][0]["wf"],
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_j["bi"][0]["wb"]), grads_np["bi"][0]["wb"],
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_j["bi"][0]["w"]), grads_np["bi"][0]["w"],
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_j["pre"][0]["w"]), grads_np["pre"][0]["w"],
            rtol=1e-3, atol=1e-4)
