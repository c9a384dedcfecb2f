"""Training-loop tests: loss decreases end-to-end, checkpoint/resume
continuity (SURVEY.md §4.2, §5 "fault injection = kill-and-resume test")."""
import dataclasses

import jax
import numpy as np

from tpu_ctc.config import (Config, DataConfig, MeshConfig, ModelConfig,
                            OptimConfig, TrainConfig)
from tpu_ctc.data.bucketing import BucketedLoader
from tpu_ctc.data.synthetic import SyntheticCorpus
from tpu_ctc.parallel.mesh import make_mesh
from tpu_ctc.train import checkpoint as ckpt_lib
from tpu_ctc.train.loop import batch_to_device_dict, evaluate, train
from tpu_ctc.train.step import (create_train_state, make_eval_step,
                                make_train_step)


def tiny_config(**kw):
    base = Config(
        model=ModelConfig(input_dim=12, hidden_dim=32, num_pre_layers=1,
                          num_bi_layers=1, vocab_size=29,
                          compute_dtype="float32"),
        optim=OptimConfig(learning_rate=2e-2, momentum=0.9),
        data=DataConfig(batch_size=8, max_frames=100, bucket_boundaries=(80,),
                        shuffle=True, seed=0, sortagrad=False),
        mesh=MeshConfig(data=1, model=1, seq=1),
        train=TrainConfig(num_epochs=6, log_every=4, checkpoint_every=0,
                          eval_every=0, metrics_path=""),
    )
    return dataclasses.replace(base, **kw)


def tiny_corpus(n=32):
    return SyntheticCorpus(num_utterances=n, feature_dim=12,
                           frames_per_char=6, min_chars=2, max_chars=8)


class TestTrainStep:
    def test_loss_decreases(self, tmp_path):
        cfg = tiny_config()
        corpus = tiny_corpus()
        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:1])
        state = create_train_state(cfg)
        step_fn, state = make_train_step(cfg, mesh, state)
        loader = BucketedLoader(corpus.all_utterances(), cfg.data)
        losses = []
        with mesh:
            for epoch in range(6):
                for _, batch in loader.epoch(epoch):
                    state, m = step_fn(state, batch_to_device_dict(batch))
                    losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
        assert np.isfinite(losses).all()

    def test_full_train_and_eval(self, tmp_path):
        cfg = tiny_config()
        corpus = tiny_corpus()
        data = corpus.all_utterances()
        state, metrics = train(cfg, data, eval_data=data[:8],
                               work_dir=str(tmp_path))
        assert metrics["loss"] < 100
        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:1])
        eval_step = make_eval_step(cfg, mesh)
        loader = BucketedLoader(data[:8], cfg.data)
        with mesh:
            ev = evaluate(state.params, cfg, loader, eval_step)
        assert 0.0 <= ev["cer"] <= 1.5
        assert ev["num_utts"] == 8


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = tiny_config()
        state = create_train_state(cfg)
        mgr = ckpt_lib.make_manager(str(tmp_path / "ck"), keep=2)
        ckpt_lib.save(mgr, state, epoch=3, batch_cursor=7, force=True)
        mgr.wait_until_finished()
        template = create_train_state(
            dataclasses.replace(cfg, seed=cfg.seed + 1))
        restored, epoch, cursor = ckpt_lib.restore(mgr, template)
        assert epoch == 3 and cursor == 7
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_kill_and_resume_continuity(self, tmp_path):
        """Train N steps with a mid-run checkpoint, 'crash', resume: the
        resumed run must continue from the checkpointed step."""
        cfg = tiny_config(
            train=TrainConfig(num_epochs=2, log_every=2, checkpoint_every=3,
                              eval_every=0, metrics_path=""))
        data = tiny_corpus(16).all_utterances()
        state1, _ = train(cfg, data, work_dir=str(tmp_path))
        steps_total = int(state1.step)
        # resume from the final checkpoint: nothing left to do, state equal
        cfg2 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, num_epochs=2))
        state2, _ = train(cfg2, data, work_dir=str(tmp_path), resume=True)
        assert int(state2.step) == steps_total
        for a, b in zip(jax.tree.leaves(state1.params),
                        jax.tree.leaves(state2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
