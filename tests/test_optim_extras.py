"""Optimizer schedule tests (momentum ramp, lr decay) and frame striding."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_ctc.config import FrontendConfig, OptimConfig
from tpu_ctc.frontend import features as F
from tpu_ctc.train.optim import make_optimizer, momentum_schedule


class TestMomentumRamp:
    def test_schedule_values(self):
        cfg = OptimConfig(momentum=0.95, momentum_start=0.5,
                          momentum_ramp_steps=100)
        sched = momentum_schedule(cfg)
        assert abs(float(sched(0)) - 0.5) < 1e-6
        assert abs(float(sched(100)) - 0.95) < 1e-6
        assert 0.5 < float(sched(50)) < 0.95

    def test_no_ramp_constant(self):
        cfg = OptimConfig(momentum=0.9, momentum_ramp_steps=0)
        sched = momentum_schedule(cfg)
        assert sched(0) == 0.9 and sched(1000) == 0.9


class TestLrDecay:
    def test_staircase_decay_applied(self):
        cfg = OptimConfig(learning_rate=1.0, momentum=0.0, nesterov=False,
                          grad_clip_norm=0.0, lr_decay=0.5, lr_decay_steps=2)
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        g = {"w": jnp.ones(3)}
        steps = []
        for _ in range(5):
            upd, state = tx.update(g, state, params)
            steps.append(float(upd["w"][0]))
        # lr: steps 0,1 -> 1.0; steps 2,3 -> 0.5; step 4 -> 0.25
        np.testing.assert_allclose(steps, [-1.0, -1.0, -0.5, -0.5, -0.25],
                                   rtol=1e-6)

    def test_disabled_without_steps(self):
        cfg = OptimConfig(learning_rate=0.1, momentum=0.0, nesterov=False,
                          grad_clip_norm=0.0, lr_decay=0.5, lr_decay_steps=0)
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones(2)}
        state = tx.init(params)
        for _ in range(3):
            upd, state = tx.update({"w": jnp.ones(2)}, state, params)
        np.testing.assert_allclose(np.asarray(upd["w"]), -0.1, rtol=1e-6)


class TestFrameStride:
    def test_stride_halves_frames(self, rng):
        cfg1 = FrontendConfig(n_mels=8, context=1, frame_stride=1)
        cfg2 = FrontendConfig(n_mels=8, context=1, frame_stride=2)
        x = jnp.asarray(rng.randn(2, 16000).astype(np.float32))
        sl = jnp.array([16000, 8000])
        f1, m1 = F.extract_features(x, cfg1, sl)
        f2, m2 = F.extract_features(x, cfg2, sl)
        assert f2.shape[1] == (f1.shape[1] + 1) // 2
        # strided output equals every other frame of the unstrided one
        np.testing.assert_allclose(np.asarray(f1)[:, ::2], np.asarray(f2),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(m1)[:, ::2], np.asarray(m2))
