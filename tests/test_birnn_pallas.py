"""Fused Pallas BiRNN recurrence parity vs the XLA scan path.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel code
compiles via Mosaic on a real TPU (exercised by the driver's TPU bench).
Covers SURVEY.md §7.1 stage 9 ("Pallas fused BiRNN step ... keep XLA scan
as fallback"): forward parity, full-layer gradient parity (dz via the dense
projection, dWf/dWb, bias), variable-length masks, and non-aligned widths.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ctc.config import ModelConfig
from tpu_ctc.models import birnn
from tpu_ctc.ops import birnn_pallas


def make_cfg(hidden, input_dim=12, num_bi=1, dtype="float32", **kw):
    return ModelConfig(input_dim=input_dim, hidden_dim=hidden,
                       num_pre_layers=1, num_bi_layers=num_bi,
                       vocab_size=7, compute_dtype=dtype, **kw)


def rand_inputs(rng, b, t, d):
    feats = rng.randn(b, t, d).astype(np.float32)
    lens = rng.randint(1, t + 1, b)
    lens[0] = t                                   # at least one full row
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(mask)


def forwards(cfg, feats, mask, key=0):
    params = birnn.init_params(jax.random.PRNGKey(key), cfg)
    scan_cfg = dataclasses.replace(cfg, birnn_impl="scan")
    pal_cfg = dataclasses.replace(cfg, birnn_impl="pallas")
    want = birnn.forward(params, scan_cfg, feats, mask)
    got = birnn.forward(params, pal_cfg, feats, mask)
    return params, scan_cfg, pal_cfg, want, got


class TestForwardParity:
    @pytest.mark.parametrize("b,t,h", [
        (2, 9, 16), (3, 24, 40), (1, 33, 128), (5, 16, 96)])
    def test_matches_scan(self, rng, b, t, h):
        cfg = make_cfg(h)
        feats, mask = rand_inputs(rng, b, t, cfg.input_dim)
        _, _, _, want, got = forwards(cfg, feats, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_deep_stack(self, rng):
        cfg = make_cfg(24, num_bi=3)
        feats, mask = rand_inputs(rng, 2, 19, cfg.input_dim)
        _, _, _, want, got = forwards(cfg, feats, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_bfloat16_streams(self, rng):
        cfg = make_cfg(32, dtype="bfloat16")
        feats, mask = rand_inputs(rng, 2, 17, cfg.input_dim)
        _, _, _, want, got = forwards(cfg, feats, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.05, atol=0.05)

    def test_masked_frames_zero(self, rng):
        cfg = make_cfg(16)
        feats, mask = rand_inputs(rng, 3, 12, cfg.input_dim)
        params = birnn.init_params(jax.random.PRNGKey(0), cfg)
        z = jnp.asarray(np.abs(np.random.RandomState(1)
                               .randn(3, 12, 16)).astype(np.float32))
        out = birnn_pallas.bi_recurrence(
            z, params["bi"][0]["wf"], params["bi"][0]["wb"], mask,
            clip=cfg.relu_clip, compute_dtype="float32")
        dead = np.asarray(out) * (1.0 - np.asarray(mask))[:, :, None]
        np.testing.assert_array_equal(dead, 0.0)


class TestUnidirectional:
    """The reference's earlier-gen forward-only family (rnn/rnnet.py)."""

    def test_matches_scan(self, rng):
        cfg = make_cfg(24, num_bi=2, bidirectional=False)
        feats, mask = rand_inputs(rng, 3, 15, cfg.input_dim)
        _, _, _, want, got = forwards(cfg, feats, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_causal(self, rng):
        """Output at time t must not depend on frames > t."""
        cfg = make_cfg(16, bidirectional=False)
        feats, _ = rand_inputs(rng, 1, 12, cfg.input_dim)
        mask = jnp.ones((1, 12), jnp.float32)
        params = birnn.init_params(jax.random.PRNGKey(0), cfg)
        base = birnn.forward(params, cfg, feats, mask)
        bumped = feats.at[:, 8:, :].add(3.0)
        out2 = birnn.forward(params, cfg, bumped, mask)
        np.testing.assert_allclose(np.asarray(out2[:, :8]),
                                   np.asarray(base[:, :8]), atol=1e-6)
        assert np.abs(np.asarray(out2[:, 8:]) -
                      np.asarray(base[:, 8:])).max() > 1e-4

    def test_grads_match_and_wb_zero(self, rng):
        cfg = make_cfg(16, bidirectional=False)
        feats, mask = rand_inputs(rng, 2, 9, cfg.input_dim)
        params, scan_cfg, pal_cfg, _, _ = forwards(cfg, feats, mask)

        def loss(p, c):
            return jnp.sum(birnn.forward(p, c, feats, mask) ** 2)

        g_scan = jax.grad(lambda p: loss(p, scan_cfg))(params)
        g_pal = jax.grad(lambda p: loss(p, pal_cfg))(params)
        for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_pal)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(g_pal["bi"][0]["wb"]), 0.0)


class TestGradParity:
    @pytest.mark.parametrize("b,t,h", [(2, 9, 16), (3, 21, 48)])
    def test_full_layer_grads(self, rng, b, t, h):
        cfg = make_cfg(h)
        feats, mask = rand_inputs(rng, b, t, cfg.input_dim)
        params, scan_cfg, pal_cfg, _, _ = forwards(cfg, feats, mask)
        probe = jnp.asarray(rng.randn(b, t, cfg.vocab_size)
                            .astype(np.float32))

        def loss(p, c):
            out = birnn.forward(p, c, feats, mask)
            return jnp.sum(out * probe * mask[:, :, None])

        g_scan = jax.grad(lambda p: loss(p, scan_cfg))(params)
        g_pal = jax.grad(lambda p: loss(p, pal_cfg))(params)
        flat_s, _ = jax.tree.flatten(g_scan)
        flat_p, _ = jax.tree.flatten(g_pal)
        for a, bb in zip(flat_s, flat_p):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)

    def test_finite_difference(self, rng):
        """Direct finite-diff check of the fused op's wf gradient — the
        same oracle the reference used for its hand-written backprop
        (SURVEY.md §4.1)."""
        b, t, h = 2, 7, 16
        z = jnp.asarray(0.1 * rng.randn(b, t, h).astype(np.float32))
        wf = jnp.asarray(0.1 * rng.randn(h, h).astype(np.float32))
        wb = jnp.asarray(0.1 * rng.randn(h, h).astype(np.float32))
        mask = jnp.ones((b, t), jnp.float32)
        probe = jnp.asarray(rng.randn(b, t, h).astype(np.float32))

        def f(w):
            out = birnn_pallas.bi_recurrence(z, w, wb, mask, clip=20.0,
                                             compute_dtype="float32")
            return jnp.sum(out * probe)

        g = np.asarray(jax.grad(f)(wf))
        eps = 1e-3
        rs = np.random.RandomState(7)
        for _ in range(6):
            i, j = rs.randint(h), rs.randint(h)
            e = np.zeros((h, h), np.float32)
            e[i, j] = eps
            num = (float(f(wf + e)) - float(f(wf - e))) / (2 * eps)
            np.testing.assert_allclose(g[i, j], num, rtol=2e-2, atol=1e-3)

    def test_remat_matches(self, rng):
        cfg = make_cfg(16, remat=True)
        feats, mask = rand_inputs(rng, 2, 11, cfg.input_dim)
        params, scan_cfg, pal_cfg, _, _ = forwards(cfg, feats, mask)

        def loss(p, c):
            return jnp.sum(birnn.forward(p, c, feats, mask) ** 2)

        g_scan = jax.grad(lambda p: loss(p, scan_cfg))(params)
        g_pal = jax.grad(lambda p: loss(p, pal_cfg))(params)
        for a, bb in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_pal)):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)


class TestDispatch:
    def test_auto_resolves_scan_on_cpu(self):
        assert birnn.resolve_birnn_impl(make_cfg(16)) == "scan"
        assert birnn.resolve_birnn_impl(
            make_cfg(16, birnn_impl="pallas")) == "pallas"

    def test_oversized_width_falls_back(self):
        assert not birnn_pallas.supported(8192, "float32")
        cfg = make_cfg(8192, birnn_impl="pallas")
        assert birnn.resolve_birnn_impl(cfg) == "scan"

    def test_mesh_guard(self):
        import jax as _jax
        from tpu_ctc.config import Config, MeshConfig
        from tpu_ctc.parallel.mesh import make_mesh
        from tpu_ctc.train.step import resolve_cfg_for_mesh
        cfg = Config(model=make_cfg(16, birnn_impl="auto"),
                     mesh=MeshConfig(data=-1, model=2))
        mesh = make_mesh(cfg.mesh)
        assert resolve_cfg_for_mesh(cfg, mesh).model.birnn_impl == "scan"
        # Explicit pallas under TP also resolves to scan for GSPMD-compiled
        # paths (eval/decode); the TRAIN step instead runs the fused kernel
        # inside shard_map (parallel.tensor_parallel) and never calls this.
        forced = dataclasses.replace(
            cfg, model=make_cfg(16, birnn_impl="pallas"))
        assert resolve_cfg_for_mesh(forced, mesh).model.birnn_impl == "scan"
        dp = Config(model=make_cfg(16), mesh=MeshConfig(data=-1))
        dp_mesh = make_mesh(dp.mesh)
        assert resolve_cfg_for_mesh(dp, dp_mesh).model.birnn_impl == "auto"


class TestCarryRecurrence:
    """Single-direction sweep from a nonzero carry (the SP chunk-local
    recurrence, SURVEY.md P4)."""

    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_scan_with_carry(self, rng, reverse):
        from tpu_ctc.ops import birnn_pallas
        b, t, h = 3, 13, 16
        cfg = make_cfg(h)
        z = jnp.asarray(0.3 * rng.randn(b, t, h).astype(np.float32))
        w = jnp.asarray(0.3 * rng.randn(h, h).astype(np.float32))
        h0 = jnp.asarray(np.abs(rng.randn(b, h)).astype(np.float32))
        lens = np.array([t, 7, 1])
        mask = jnp.asarray((np.arange(t)[None] < lens[:, None])
                           .astype(np.float32))
        want, want_last = birnn._recurrence_with_carry(
            z, w, mask, reverse, h0,
            cfg=dataclasses.replace(cfg, birnn_impl="scan"))
        got = birnn_pallas.carry_recurrence(
            z, w, h0, mask, reverse=reverse, clip=cfg.relu_clip,
            compute_dtype="float32")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        got_last = got[:, 0] if reverse else got[:, -1]
        np.testing.assert_allclose(np.asarray(got_last),
                                   np.asarray(want_last),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("reverse", [False, True])
    def test_grads_including_carry(self, rng, reverse):
        from tpu_ctc.ops import birnn_pallas
        b, t, h = 2, 9, 16
        cfg = make_cfg(h)
        z = jnp.asarray(0.3 * rng.randn(b, t, h).astype(np.float32))
        w = jnp.asarray(0.3 * rng.randn(h, h).astype(np.float32))
        h0 = jnp.asarray(np.abs(rng.randn(b, h)).astype(np.float32))
        mask = jnp.ones((b, t), jnp.float32)
        probe = jnp.asarray(rng.randn(b, t, h).astype(np.float32))

        def f_scan(args):
            z_, w_, h0_ = args
            hs, _ = birnn._recurrence_with_carry(
                z_, w_, mask, reverse, h0_,
                cfg=dataclasses.replace(cfg, birnn_impl="scan"))
            return jnp.sum(hs * probe)

        def f_pal(args):
            z_, w_, h0_ = args
            hs = birnn_pallas.carry_recurrence(
                z_, w_, h0_, mask, reverse=reverse, clip=cfg.relu_clip,
                compute_dtype="float32")
            return jnp.sum(hs * probe)

        g_scan = jax.grad(f_scan)((z, w, h0))
        g_pal = jax.grad(f_pal)((z, w, h0))
        for a, bb in zip(g_scan, g_pal):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)
