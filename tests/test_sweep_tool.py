"""Smoke test for tools/sweep_decode.py (the decoder_config.py tuning
role, VERDICT r4 item 2): tiny manifest + untrained checkpoint, a 2-point
(alpha, beta) grid, JSON output with a best point and the full grid."""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture
def tiny_manifest(tmp_path):
    from tpu_ctc.data.manifest import write_manifest
    from make_manifest import records_from_dir

    rng = np.random.RandomState(0)
    words = ["hello", "world", "cat", "dog"]
    for i in range(6):
        arr = rng.randn(40, 23).astype(np.float32)
        np.save(tmp_path / f"utt{i}.npy", arr)
        (tmp_path / f"utt{i}.txt").write_text(
            " ".join(words[j % 4] for j in range(i % 3 + 1)))
    recs = list(records_from_dir(str(tmp_path)))
    write_manifest(str(tmp_path), "train", recs)
    write_manifest(str(tmp_path), "dev", recs[:4])
    return tmp_path


def test_sweep_runs_and_reports_grid(tiny_manifest, tmp_path, capsys):
    import sweep_decode

    from tpu_ctc.config import get_config
    from tpu_ctc.train import checkpoint as ckpt_lib
    from tpu_ctc.train.step import create_train_state

    ck = tmp_path / "ck"
    cfg = get_config("1").override(**{
        "model.hidden_dim": 16, "data.batch_size": 4,
        "data.bucket_boundaries": (48,), "data.max_label_len": 24,
        "decode.beam_width": 8})
    state = create_train_state(cfg)
    mgr = ckpt_lib.make_manager(str(ck))
    ckpt_lib.save(mgr, state, epoch=0, batch_cursor=0, force=True)
    mgr.wait_until_finished()
    mgr.close()

    rc = sweep_decode.main([
        "--config", "1",
        "--set", "model.hidden_dim=16", "--set", "data.batch_size=4",
        "--set", "data.bucket_boundaries=(48,)",
        "--set", "data.max_label_len=24", "--set", "decode.beam_width=8",
        "--data", str(tiny_manifest), "--split", "dev",
        "--checkpoint", str(ck),
        "--alphas", "1.0", "--betas", "0.0,1.0"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["n_utts"] == 4
    assert len(result["grid"]) == 2
    assert result["best"] in result["grid"]
    assert {r["beta"] for r in result["grid"]} == {0.0, 1.0}
