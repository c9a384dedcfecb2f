"""End-to-end eval-job plumbing: cli decode → ref/hyp trn files → cli
score WER/CER (SURVEY.md C13 — the eval2000 scoring path, in-framework)."""
import os

import numpy as np
import pytest

from tpu_ctc.cli import main as cli_main
from tpu_ctc.data import audio_io
from tpu_ctc.data.manifest import write_manifest
from tpu_ctc.decode.wer import parse_trn, score_corpus, write_trn


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("eval_corpus"))
    rng = np.random.RandomState(7)
    records = []
    for i in range(6):
        n = 4000 + 800 * i
        wav = (0.3 * np.sin(2 * np.pi * (250 + 40 * i)
                            * np.arange(n) / 16000)).astype(np.float32)
        audio_io.write_wav(os.path.join(root, f"u{i}.wav"), wav, 16000)
        records.append({"id": f"u{i}", "audio": f"u{i}.wav",
                        "text": ["hi there", "a test", "more words here"][i % 3],
                        "samples": n, "rate": 16000})
    write_manifest(root, "train", records)
    return root


class TestDecodeEvalJob:
    def test_decode_emits_trn_and_scores(self, corpus, tmp_path, capsys):
        hyp_dir = str(tmp_path / "hyps")
        rc = cli_main([
            "decode", "--config", "1",
            "--set", "model.hidden_dim=16", "--set", "model.input_dim=40",
            "--set", "model.compute_dtype=float32",
            "--set", "frontend.n_mels=40", "--set", "frontend.context=0",
            "--set", "data.batch_size=8",
            "--set", "data.bucket_boundaries=(60,)",
            "--data", corpus, "--hyp-out", hyp_dir,
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "WER" in out and "CER" in out
        refs = parse_trn(os.path.join(hyp_dir, "ref.trn"))
        hyps = parse_trn(os.path.join(hyp_dir, "hyp.trn"))
        # Every non-dropped utterance appears under its manifest id.
        assert set(refs) == set(hyps)
        assert set(refs) <= {f"u{i}" for i in range(6)}
        assert refs["u0"] == "hi there"

    def test_score_subcommand(self, tmp_path, capsys):
        ref = {"a": "the cat sat", "b": "hello world"}
        hyp = {"a": "the cat sat", "b": "hello word"}
        write_trn(str(tmp_path / "ref.trn"), ref)
        write_trn(str(tmp_path / "hyp.trn"), hyp)
        rc = cli_main(["score", "--ref", str(tmp_path / "ref.trn"),
                       "--hyp", str(tmp_path / "hyp.trn")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "WER 20.00%" in out   # 1 sub / 5 words
        totals, _ = score_corpus(ref, hyp, "word")
        assert (totals["sub"], totals["ins"], totals["del"]) == (1, 0, 0)

    def test_score_subcommand_ci(self, tmp_path, capsys):
        ref = {f"u{i}": "aa bb cc dd" for i in range(12)}
        hyp = dict(ref, u0="aa bb cc xx", u5="aa yy cc dd")
        write_trn(str(tmp_path / "ref.trn"), ref)
        write_trn(str(tmp_path / "hyp.trn"), hyp)
        rc = cli_main(["score", "--ref", str(tmp_path / "ref.trn"),
                       "--hyp", str(tmp_path / "hyp.trn"), "--unit", "word",
                       "--ci"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "95% CI [" in out


class TestEvaluateBeam:
    def test_evaluate_reports_beam_wer(self):
        import dataclasses

        from tpu_ctc.config import DataConfig, get_config
        from tpu_ctc.data.bucketing import BucketedLoader
        from tpu_ctc.data.synthetic import SyntheticCorpus
        from tpu_ctc.decode.beam import make_beam_decoder
        from tpu_ctc.parallel.mesh import make_mesh
        from tpu_ctc.train.loop import evaluate
        from tpu_ctc.train.step import create_train_state, make_eval_step

        cfg = dataclasses.replace(
            get_config("1", **{"model.hidden_dim": 16,
                               "model.compute_dtype": "float32"}),
            data=DataConfig(batch_size=8, max_frames=100,
                            bucket_boundaries=(100,), shuffle=False,
                            sortagrad=False))
        corpus = SyntheticCorpus(num_utterances=8,
                                 feature_dim=cfg.model.input_dim,
                                 max_chars=6)
        data = corpus.all_utterances()
        loader = BucketedLoader(data, cfg.data)
        mesh = make_mesh(cfg.mesh)
        state = create_train_state(cfg)
        eval_step = make_eval_step(cfg, mesh)
        beam_fn = make_beam_decoder(cfg)
        with mesh:
            ev = evaluate(state.params, cfg, loader, eval_step,
                          beam_decode_fn=beam_fn, max_batches=1)
        assert "beam_wer" in ev and "beam_cer" in ev
        assert ev["beam_cer"] >= 0.0  # random params: plumbing check only
