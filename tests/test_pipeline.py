"""Pipeline-parallel (GPipe over 'model' axis) equivalence tests.

SURVEY.md P3.  Oracle: sharded-vs-replicated training equivalence on the
virtual 8-device CPU mesh (§4.2).
"""
import dataclasses

import jax
import numpy as np
import pytest

from tpu_ctc.config import (Config, DataConfig, MeshConfig, ModelConfig,
                            OptimConfig, TrainConfig)
from tpu_ctc.data.bucketing import BucketedLoader
from tpu_ctc.data.synthetic import SyntheticCorpus
from tpu_ctc.parallel import mesh as mesh_lib
from tpu_ctc.parallel.pipeline import stack_bi_params, unstack_bi_params
from tpu_ctc.train.loop import batch_to_device_dict
from tpu_ctc.train.step import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def tiny_config(mesh):
    return Config(
        model=ModelConfig(input_dim=12, hidden_dim=32, num_pre_layers=1,
                          num_bi_layers=4, vocab_size=29,
                          compute_dtype="float32"),
        optim=OptimConfig(learning_rate=1e-2, momentum=0.9),
        data=DataConfig(batch_size=8, max_frames=80, bucket_boundaries=(64,),
                        shuffle=False, seed=0, sortagrad=False),
        mesh=mesh,
        train=TrainConfig(num_epochs=1, log_every=1, checkpoint_every=0,
                          eval_every=0, metrics_path=""),
    )


def run_steps(cfg, n_steps=3, n_devices=None):
    devices = jax.devices()[:n_devices] if n_devices else None
    mesh = mesh_lib.make_mesh(cfg.mesh, devices=devices)
    corpus = SyntheticCorpus(num_utterances=16, feature_dim=12,
                             frames_per_char=6, min_chars=2, max_chars=8)
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


class TestStacking:
    def test_stack_unstack_roundtrip(self):
        cfg = tiny_config(MeshConfig()).model
        params = jax.tree.map(
            np.asarray,
            create_train_state(tiny_config(MeshConfig())).params)
        stacked = stack_bi_params(params)
        assert stacked["bi"]["wf"].shape[0] == cfg.num_bi_layers
        back = unstack_bi_params(stacked, cfg.num_bi_layers)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPipelineParallel:
    @pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (4, 2)])
    def test_pp_matches_single_device(self, stages, micro):
        ref_state, ref_losses = run_steps(
            tiny_config(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        pp_state, pp_losses = run_steps(
            tiny_config(MeshConfig(data=8 // stages, model=stages, seq=1,
                                   pipeline=True,
                                   pipeline_microbatches=micro)))
        np.testing.assert_allclose(ref_losses, pp_losses, rtol=1e-4)
        ref_flat = jax.tree.leaves(stack_bi_params(ref_state.params))
        pp_flat = jax.tree.leaves(pp_state.params)
        for a, b in zip(ref_flat, pp_flat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_pp_requires_stages(self):
        cfg = tiny_config(MeshConfig(data=8, model=1, seq=1, pipeline=True))
        mesh = mesh_lib.make_mesh(cfg.mesh)
        state = create_train_state(cfg)
        with pytest.raises(ValueError):
            make_train_step(cfg, mesh, state)


class TestPipelinePallas:
    def test_pp_pallas_kernels_match_single_device(self):
        """Pipeline stages run under shard_map (manual mode), so the fused
        Pallas recurrence works per-stage: PP2 with birnn_impl='pallas'
        must match the single-device scan run."""
        import dataclasses

        def pallas_cfg(mesh):
            cfg = tiny_config(mesh)
            return dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model,
                                               birnn_impl="pallas"))

        ref_state, ref_losses = run_steps(
            tiny_config(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        pp_state, pp_losses = run_steps(
            pallas_cfg(MeshConfig(data=4, model=2, seq=1, pipeline=True,
                                  pipeline_microbatches=2)))
        np.testing.assert_allclose(ref_losses, pp_losses, rtol=1e-4)
        ref_flat = jax.tree.leaves(stack_bi_params(ref_state.params))
        pp_flat = jax.tree.leaves(pp_state.params)
        for a, b in zip(ref_flat, pp_flat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
