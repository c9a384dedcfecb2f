"""Sequence-parallelism equivalence tests on the virtual 8-device CPU mesh.

SURVEY.md §7.1 stage 11: time-chunk sharding on 'seq', ppermute carry ring;
sharded-vs-replicated allclose is the oracle (§4.2).
"""
import dataclasses

import jax
import jax.numpy as np_unused  # noqa
import numpy as np
import pytest

from tpu_ctc.config import (Config, DataConfig, MeshConfig, ModelConfig,
                            OptimConfig, TrainConfig)
from tpu_ctc.data.bucketing import BucketedLoader
from tpu_ctc.data.synthetic import SyntheticCorpus
from tpu_ctc.parallel import mesh as mesh_lib
from tpu_ctc.train.loop import batch_to_device_dict
from tpu_ctc.train.step import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def tiny_config(mesh):
    return Config(
        model=ModelConfig(input_dim=12, hidden_dim=32, num_pre_layers=1,
                          num_bi_layers=2, vocab_size=29,
                          compute_dtype="float32"),
        optim=OptimConfig(learning_rate=1e-2, momentum=0.9),
        data=DataConfig(batch_size=8, max_frames=96, bucket_boundaries=(96,),
                        shuffle=False, seed=0, sortagrad=False),
        mesh=mesh,
        train=TrainConfig(num_epochs=1, log_every=1, checkpoint_every=0,
                          eval_every=0, metrics_path=""),
    )


def run_steps(cfg, n_steps=3, n_devices=None):
    devices = jax.devices()[:n_devices] if n_devices else None
    mesh = mesh_lib.make_mesh(cfg.mesh, devices=devices)
    corpus = SyntheticCorpus(num_utterances=16, feature_dim=12,
                             frames_per_char=7, min_chars=2, max_chars=8)
    loader = BucketedLoader(corpus.all_utterances(), cfg.data)
    state = create_train_state(cfg)
    step_fn, state = make_train_step(cfg, mesh, state)
    losses = []
    with mesh:
        done = 0
        for epoch in range(10):
            for _, batch in loader.epoch(epoch):
                state, m = step_fn(state, batch_to_device_dict(batch))
                losses.append(float(m["loss"]))
                done += 1
                if done >= n_steps:
                    return state, losses
    return state, losses


class TestSequenceParallel:
    @pytest.mark.parametrize("seq", [2, 4])
    def test_sp_matches_single_device(self, seq):
        ref_state, ref_losses = run_steps(
            tiny_config(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        sp_state, sp_losses = run_steps(
            tiny_config(MeshConfig(data=2, model=1, seq=seq)),
            n_devices=2 * seq)
        np.testing.assert_allclose(ref_losses, sp_losses, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(sp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_sp_with_model_axis_rejected(self):
        # config-validation error with written rationale (PARITY.md
        # "Parallelism composition"), not a bare NotImplementedError
        cfg = tiny_config(MeshConfig(data=1, model=2, seq=4))
        mesh = mesh_lib.make_mesh(cfg.mesh)
        state = create_train_state(cfg)
        with pytest.raises(ValueError, match="PARITY.md"):
            make_train_step(cfg, mesh, state)

    def test_pp_with_seq_axis_rejected(self):
        cfg = tiny_config(MeshConfig(data=1, model=2, seq=4, pipeline=True,
                                     pipeline_microbatches=2))
        mesh = mesh_lib.make_mesh(cfg.mesh)
        state = create_train_state(cfg)
        with pytest.raises(ValueError, match="PARITY.md"):
            make_train_step(cfg, mesh, state)


class TestSequenceParallelPallas:
    def test_sp_pallas_kernels_match_single_device(self):
        """SP runs under shard_map (manual mode), so the fused Pallas
        carry recurrence works per-chunk: SP4 with birnn_impl='pallas'
        must match the single-device scan run exactly."""
        import dataclasses

        def pallas_cfg(mesh):
            cfg = tiny_config(mesh)
            return dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model,
                                               birnn_impl="pallas"))

        ref_state, ref_losses = run_steps(
            tiny_config(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        sp_state, sp_losses = run_steps(
            pallas_cfg(MeshConfig(data=2, model=1, seq=4)))
        np.testing.assert_allclose(ref_losses, sp_losses, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(sp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
