"""Hybrid mesh / distributed-init helpers and profiling utilities."""
import jax
import numpy as np
import pytest

from tpu_ctc.config import Config, MeshConfig, ModelConfig
from tpu_ctc.parallel import distributed
from tpu_ctc.utils import profiling


class TestHybridMesh:
    def test_shape_and_axes(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 devices")
        mesh = distributed.hybrid_mesh(MeshConfig(data=-1, model=2, seq=1))
        assert dict(mesh.shape) == {"data": 4, "model": 2, "seq": 1}

    def test_initialize_single_process_noop(self):
        distributed.initialize()  # must not raise in single-process mode
        assert jax.process_count() == 1

    def test_local_batch_slice(self):
        s = distributed.local_batch_slice(32)
        assert s == slice(0, 32)
        with pytest.raises(ValueError):
            distributed.local_batch_slice(7) if jax.process_count() > 1 \
                else (_ for _ in ()).throw(ValueError())


class TestProfiling:
    def test_step_timer(self):
        t = profiling.StepTimer()
        for _ in range(3):
            t.start()
            t.stop(audio_seconds=4.0)
        s = t.summary(skip_first=1)
        assert s["steps"] == 2
        assert s["audio_s_per_s"] > 0

    def test_flops_estimate_scales(self):
        cfg = Config(model=ModelConfig(input_dim=40, hidden_dim=256,
                                       num_bi_layers=3))
        f1 = profiling.flops_estimate(cfg, batch=8, frames=100)
        f2 = profiling.flops_estimate(cfg, batch=16, frames=100)
        assert abs(f2 / f1 - 2.0) < 1e-6
        assert profiling.mfu(cfg, 8, 100, step_time_s=1.0) > 0
