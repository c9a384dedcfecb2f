"""Sharded-vs-replicated equivalence on the forced-8-device CPU mesh.

SURVEY.md §4.2: "Sharded-vs-replicated equivalence tests (same batch,
1-device vs 8-device mesh, allclose) stand in for real multi-host."
Covers DP (data axis), TP (model axis, SURVEY P2), and the mesh helpers.
"""
import dataclasses

import jax
import jax.numpy as jnp
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
                          num_bi_layers=1, vocab_size=29,
                          compute_dtype="float32"),
        optim=OptimConfig(learning_rate=1e-2, momentum=0.9),
        data=DataConfig(batch_size=8, max_frames=100, bucket_boundaries=(80,),
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


class TestMeshConstruction:
    def test_resolve_auto_axis(self):
        assert mesh_lib.resolve_mesh_shape(
            MeshConfig(data=-1, model=2, seq=1), 8) == (4, 2, 1)

    def test_resolve_rejects_bad(self):
        with pytest.raises(ValueError):
            mesh_lib.resolve_mesh_shape(MeshConfig(data=3, model=2, seq=1), 8)

    def test_make_mesh_axes(self):
        mesh = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
        assert mesh.axis_names == mesh_lib.MESH_AXES


class TestDataParallel:
    def test_dp8_matches_single_device(self):
        ref_state, ref_losses = run_steps(
            tiny_config(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        dp_state, dp_losses = run_steps(
            tiny_config(MeshConfig(data=8, model=1, seq=1)))
        np.testing.assert_allclose(ref_losses, dp_losses, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(dp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestDataParallelPallas:
    def test_dp8_pallas_kernels_match_single_device(self):
        """The Pallas CTC + BiRNN ops are opaque to GSPMD; the shard_map DP
        loss path (train.step.make_dp_loss_fn) runs them batch-sharded.
        Interpret-mode kernels on the virtual mesh stand in for Mosaic."""
        def pallas_cfg(mesh):
            cfg = tiny_config(mesh)
            return dataclasses.replace(
                cfg, ctc_impl="pallas",
                model=dataclasses.replace(cfg.model, birnn_impl="pallas"))

        ref_state, ref_losses = run_steps(
            pallas_cfg(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        dp_state, dp_losses = run_steps(
            pallas_cfg(MeshConfig(data=8, model=1, seq=1)))
        np.testing.assert_allclose(ref_losses, dp_losses, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(dp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestTensorParallel:
    def test_tp4_matches_single_device(self):
        ref_state, ref_losses = run_steps(
            tiny_config(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        tp_state, tp_losses = run_steps(
            tiny_config(MeshConfig(data=2, model=4, seq=1)))
        np.testing.assert_allclose(ref_losses, tp_losses, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(tp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_tp4_pallas_kernels_match_single_device(self):
        """The shard_map TP path keeps the fused Pallas recurrence per
        device (VERDICT r1 item 3): z partials reduce-scatter over batch,
        the kernel runs on full hidden width, all_to_all restores the
        H-sharded layout.  Interpret mode stands in for Mosaic on CPU."""
        def pallas_cfg(mesh):
            cfg = tiny_config(mesh)
            return dataclasses.replace(
                cfg, ctc_impl="pallas",
                model=dataclasses.replace(cfg.model, birnn_impl="pallas"))

        ref_state, ref_losses = run_steps(
            pallas_cfg(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        tp_state, tp_losses = run_steps(
            pallas_cfg(MeshConfig(data=2, model=4, seq=1)))
        np.testing.assert_allclose(ref_losses, tp_losses, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(tp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_tp8_deeper_stack_matches_single_device(self):
        def deep_cfg(mesh):
            cfg = tiny_config(mesh)
            return dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, num_pre_layers=2, num_bi_layers=2,
                    num_post_layers=1))

        ref_state, ref_losses = run_steps(
            deep_cfg(MeshConfig(data=1, model=1, seq=1)), n_devices=1)
        tp_state, tp_losses = run_steps(
            deep_cfg(MeshConfig(data=1, model=8, seq=1)))
        np.testing.assert_allclose(ref_losses, tp_losses, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(tp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_params_actually_sharded(self):
        cfg = tiny_config(MeshConfig(data=1, model=8, seq=1))
        mesh = mesh_lib.make_mesh(cfg.mesh)
        state = create_train_state(cfg)
        _, state = make_train_step(cfg, mesh, state)
        w = state.params["bi"][0]["w"]
        # bi-layer input projection is (hidden, hidden), row-parallel:
        # each shard holds 1/8 of the input rows (H/n, H).
        shard_shapes = {s.data.shape for s in w.addressable_shards}
        assert shard_shapes == {(32 // 8, 32)}
        # recurrent matrices stay replicated whole (the fused kernel's
        # VMEM-resident operand).
        wf = state.params["bi"][0]["wf"]
        assert {s.data.shape for s in wf.addressable_shards} == {(32, 32)}

    def test_tp_validation_errors(self):
        from tpu_ctc.parallel.tensor_parallel import validate_tp
        cfg = tiny_config(MeshConfig(data=1, model=8, seq=1))
        bad_hidden = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, hidden_dim=36))
        mesh = mesh_lib.make_mesh(cfg.mesh)
        with pytest.raises(ValueError, match="hidden_dim"):
            validate_tp(bad_hidden, mesh)
        bad_pre = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, num_pre_layers=0))
        with pytest.raises(ValueError, match="num_pre_layers"):
            validate_tp(bad_pre, mesh)
