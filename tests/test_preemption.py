"""Fault injection: SIGTERM a training subprocess mid-run, assert it
checkpoints at the cursor and a resumed run continues from there
(SURVEY.md §5: "fault injection = kill-and-resume test")."""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import dataclasses, sys
# force CPU: this machine's sitecustomize overrides JAX_PLATFORMS with the
# (single-claim) TPU backend, which would contend with other TPU work.
import jax
jax.config.update("jax_platforms", "cpu")
from tpu_ctc.config import (Config, DataConfig, MeshConfig, ModelConfig,
                            OptimConfig, TrainConfig)
from tpu_ctc.data.synthetic import SyntheticCorpus
from tpu_ctc.train.loop import train

cfg = Config(
    model=ModelConfig(input_dim=12, hidden_dim=32, num_pre_layers=1,
                      num_bi_layers=1, vocab_size=29,
                      compute_dtype="float32"),
    optim=OptimConfig(learning_rate=1e-2),
    data=DataConfig(batch_size=8, max_frames=100, bucket_boundaries=(80,),
                    shuffle=True, seed=0, sortagrad=False),
    mesh=MeshConfig(data=1, model=1, seq=1),
    train=TrainConfig(num_epochs=200, log_every=1, checkpoint_every=0,
                      eval_every=0, metrics_path="metrics.jsonl"),
)
data = SyntheticCorpus(num_utterances=32, feature_dim=12,
                       frames_per_char=6).all_utterances()
resume = "--resume" in sys.argv
if resume:
    # short run to completion after resume
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_epochs=1))
print("READY", flush=True)
train(cfg, data, work_dir=sys.argv[1], resume=resume)
print("DONE", flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="posix signals")
def test_sigterm_checkpoints_and_resumes(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-c", SCRIPT, str(tmp_path)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    # wait for training to produce a few steps
    metrics = tmp_path / "metrics.jsonl"
    deadline = time.time() + 120
    while time.time() < deadline:
        if metrics.exists() and metrics.read_text().count('"train"') >= 3:
            break
        time.sleep(1.0)
    else:
        proc.kill()
        pytest.fail("training did not start in time")

    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=120)
    assert "[preempt] checkpointed at step" in out, (out, err)
    assert proc.returncode == 0

    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    pre = [l for l in lines if l.get("kind") == "preempted"]
    assert pre, "no preempted event logged"
    assert (tmp_path / "checkpoints").exists()

    # resume run completes cleanly from the checkpoint
    proc2 = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path), "--resume"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert proc2.returncode == 0, proc2.stderr
    assert "DONE" in proc2.stdout
    assert "[ckpt] resumed at epoch" in proc2.stdout


def test_npz_export_import_roundtrip(tmp_path):
    """writeNumpyWeights parity (SURVEY C14): flat .npz export of the
    param tree round-trips bitwise through import_npz."""
    import jax
    import numpy as np

    from tpu_ctc.config import Config, ModelConfig
    from tpu_ctc.train import checkpoint as ckpt_lib
    from tpu_ctc.train.step import create_train_state

    cfg = Config(model=ModelConfig(input_dim=12, hidden_dim=16,
                                   num_pre_layers=1, num_bi_layers=2,
                                   vocab_size=29))
    state = create_train_state(cfg)
    path = str(tmp_path / "w.npz")
    n = ckpt_lib.export_npz(path, state.params)
    assert n == len(jax.tree.leaves(state.params))
    back = ckpt_lib.import_npz(path, state.params)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # wrong-shape template fails loudly
    import dataclasses
    import pytest
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, hidden_dim=32))
    with pytest.raises((ValueError, KeyError)):
        ckpt_lib.import_npz(path, create_train_state(cfg2).params)
