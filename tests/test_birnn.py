"""BiRNN model tests: scan-vs-Python-loop oracle, masks, grads, remat.

SURVEY.md §7.1 stage 4: "finite-diff grad check at tiny dims; fwd/bwd scan
equivalence vs a Python-loop oracle."
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ctc.config import ModelConfig
from tpu_ctc.models import birnn


def tiny_cfg(**kw):
    base = dict(input_dim=5, hidden_dim=8, num_pre_layers=1, num_bi_layers=1,
                num_post_layers=0, vocab_size=6, compute_dtype="float32",
                init_scale=0.1)
    base.update(kw)
    return ModelConfig(**base)


def loop_oracle(params, cfg, feats, mask):
    """Plain-numpy forward replicating the reference's per-step Python loop
    semantics (SURVEY.md §3.1) — the correctness oracle for the scan."""
    def act(x):
        return np.clip(x, 0.0, cfg.relu_clip)

    x = np.asarray(feats, dtype=np.float32)
    m = np.asarray(mask, dtype=np.float32)
    for layer in params["pre"]:
        w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
        x = act(x @ w + b)
    for layer in params["bi"]:
        w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
        wf, wb = np.asarray(layer["wf"]), np.asarray(layer["wb"])
        z = x @ w + b
        B, T, H = z.shape
        f = np.zeros((B, T, H), np.float32)
        bwd = np.zeros((B, T, H), np.float32)
        for t in range(T):
            prev = f[:, t - 1] if t > 0 else np.zeros((B, H), np.float32)
            f[:, t] = act(z[:, t] + prev @ wf) * m[:, t:t + 1]
        for t in reversed(range(T)):
            nxt = bwd[:, t + 1] if t < T - 1 else np.zeros((B, H), np.float32)
            bwd[:, t] = act(z[:, t] + nxt @ wb) * m[:, t:t + 1]
        x = f + bwd
    for layer in params["post"]:
        w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
        x = act(x @ w + b)
    w, b = np.asarray(params["out"]["w"]), np.asarray(params["out"]["b"])
    return x @ w + b


class TestForward:
    def test_scan_matches_loop_oracle(self, rng):
        cfg = tiny_cfg(num_pre_layers=2, num_bi_layers=2, num_post_layers=1)
        params = birnn.init_params(jax.random.PRNGKey(0), cfg)
        B, T = 3, 11
        feats = rng.randn(B, T, cfg.input_dim).astype(np.float32)
        mask = np.ones((B, T), np.float32)
        mask[1, 7:] = 0.0
        mask[2, 4:] = 0.0
        got = np.asarray(birnn.forward(params, cfg, jnp.asarray(feats),
                                       jnp.asarray(mask)))
        want = loop_oracle(params, cfg, feats, mask)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_trailing_padding_does_not_affect_valid_frames(self, rng):
        """Logits at valid frames must be identical with/without padding —
        the mask isolates the backward recurrence from padded frames."""
        cfg = tiny_cfg()
        params = birnn.init_params(jax.random.PRNGKey(1), cfg)
        B, T = 2, 9
        feats = rng.randn(B, T, cfg.input_dim).astype(np.float32)
        mask = np.ones((B, T), np.float32)
        out1 = np.asarray(birnn.forward(params, cfg, jnp.asarray(feats),
                                        jnp.asarray(mask)))
        padded = np.concatenate(
            [feats, rng.randn(B, 4, cfg.input_dim).astype(np.float32)], axis=1)
        pmask = np.concatenate([mask, np.zeros((B, 4), np.float32)], axis=1)
        out2 = np.asarray(birnn.forward(params, cfg, jnp.asarray(padded),
                                        jnp.asarray(pmask)))
        np.testing.assert_allclose(out2[:, :T], out1, rtol=1e-5, atol=1e-6)

    def test_remat_matches(self, rng):
        cfg = tiny_cfg()
        cfg_r = dataclasses.replace(cfg, remat=True)
        params = birnn.init_params(jax.random.PRNGKey(2), cfg)
        feats = jnp.asarray(rng.randn(2, 7, cfg.input_dim).astype(np.float32))
        mask = jnp.ones((2, 7))
        a = birnn.forward(params, cfg, feats, mask)
        b = birnn.forward(params, cfg_r, feats, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_clipped_relu(self):
        x = jnp.array([-1.0, 0.0, 5.0, 25.0])
        np.testing.assert_allclose(
            np.asarray(birnn.clipped_relu(x, 20.0)), [0.0, 0.0, 5.0, 20.0])


class TestGrad:
    def test_finite_difference(self, rng):
        """Model-level FD grad check (the reference's ad-hoc net check)."""
        cfg = tiny_cfg()
        params = birnn.init_params(jax.random.PRNGKey(3), cfg)
        feats = jnp.asarray(rng.randn(2, 6, cfg.input_dim).astype(np.float32))
        mask = jnp.ones((2, 6))
        target = jnp.asarray(rng.randn(2, 6, cfg.vocab_size).astype(np.float32))

        def loss(p):
            out = birnn.forward(p, cfg, feats, mask)
            return jnp.sum(jnp.square(out - target))

        g = jax.jit(jax.grad(loss))(params)
        flat_g, _ = jax.tree.flatten(g)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat_g)
        # Directional FD on one weight matrix.
        w0 = np.asarray(params["bi"][0]["wf"])
        d = rng.randn(*w0.shape).astype(np.float32)
        d /= np.linalg.norm(d)
        eps = 1e-3

        def with_wf(w):
            p = jax.tree.map(lambda x: x, params)
            p["bi"][0]["wf"] = jnp.asarray(w)
            return float(loss(p))

        fd = (with_wf(w0 + eps * d) - with_wf(w0 - eps * d)) / (2 * eps)
        analytic = float(jnp.sum(jnp.asarray(d) * g["bi"][0]["wf"]))
        np.testing.assert_allclose(fd, analytic, rtol=5e-2, atol=1e-2)


class TestPartitionSpecs:
    def test_specs_match_param_tree(self):
        cfg = tiny_cfg(num_pre_layers=2, num_bi_layers=3, num_post_layers=1)
        params = birnn.init_params(jax.random.PRNGKey(0), cfg)
        specs = birnn.param_partition_specs(cfg)
        pt = jax.tree.structure(params)
        from jax.sharding import PartitionSpec
        st = jax.tree.structure(specs,
                                is_leaf=lambda x: isinstance(x, PartitionSpec))
        assert pt == st
