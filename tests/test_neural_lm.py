"""Neural char LM tests: training reduces NLL; beam-search integration
parity (device per-beam GRU states vs host recompute-from-prefix)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_ctc.decode import neural_lm
from tpu_ctc.decode.beam import prefix_beam_search, prefix_beam_search_host
from tpu_ctc.decode.neural_lm import (CharRNNLMConfig, CharRNNLMHost,
                                      train_char_rnn_lm)


def np_log_softmax(x):
    m = x.max(axis=-1, keepdims=True)
    e = x - m
    return e - np.log(np.exp(e).sum(axis=-1, keepdims=True))


class TestTraining:
    def test_nll_decreases_on_patterned_corpus(self, rng):
        # corpus: strict repetition 1,2,3,1,2,3 — learnable quickly
        seqs = [np.array(([1, 2, 3] * 8)[:20], np.int32) for _ in range(32)]
        cfg = CharRNNLMConfig(vocab_size=5, embed_dim=16, hidden_dim=32)
        params0 = neural_lm.init_params(jax.random.PRNGKey(0), cfg)
        padded = jnp.asarray(np.stack(seqs))
        lens = jnp.full((len(seqs),), 20, jnp.int32)
        nll0 = float(neural_lm.sequence_nll(params0, padded, lens))
        params, nll = train_char_rnn_lm(seqs, cfg, steps=200, batch_size=16)
        assert nll < nll0 * 0.5, (nll0, nll)

    def test_log_probs_normalized_blank_masked(self):
        cfg = CharRNNLMConfig(vocab_size=6, embed_dim=8, hidden_dim=16)
        params = neural_lm.init_params(jax.random.PRNGKey(1), cfg)
        h = neural_lm.init_state(params, (3,))
        lp = np.asarray(neural_lm.log_probs(params, h))
        np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-5)
        assert (lp[:, 0] < -1e20).all()   # blank never predicted


class TestBeamIntegration:
    def test_device_vs_host_parity_with_neural_lm(self, rng):
        t, a, k = 8, 4, 8
        cfg = CharRNNLMConfig(vocab_size=a, embed_dim=8, hidden_dim=16)
        params = neural_lm.init_params(jax.random.PRNGKey(2), cfg)
        log_probs = np_log_softmax(rng.randn(t, a).astype(np.float32) * 1.5)

        host_lm = CharRNNLMHost(params)
        h_best, h_score = prefix_beam_search_host(
            log_probs, beam_width=k, lm=host_lm, lm_alpha=0.6, lm_beta=0.3)
        hyps, lens, scores = prefix_beam_search(
            jnp.asarray(log_probs[None].astype(np.float32)),
            jnp.array([t]), beam_width=k, max_len=t,
            lm_alpha=0.6, lm_beta=0.3, nlm_params=params)
        d_best = list(np.asarray(hyps[0])[: int(lens[0])])
        assert d_best == h_best, (d_best, h_best)
        np.testing.assert_allclose(float(scores[0]), h_score, rtol=1e-3)


class TestNeuralLMCli:
    def test_cli_decode_with_neural_lm(self, tmp_path, capsys):
        """SURVEY C10 end-to-end: `cli decode --beam` with
        decode.neural_lm=True trains the in-repo GRU char LM on the
        train transcripts and fuses it into the (fused-kernel) search."""
        from tpu_ctc.cli import main as cli_main

        rc = cli_main([
            "decode", "--config", "1",
            "--set", "model.hidden_dim=16", "--set", "model.input_dim=8",
            "--set", "model.compute_dtype=float32",
            "--set", "data.batch_size=4",
            "--set", "data.bucket_boundaries=(80,)",
            "--set", "decode.beam_width=8",
            "--set", "decode.neural_lm=True",
            "--set", "decode.neural_lm_hidden=16",
            "--set", "decode.neural_lm_embed=8",
            "--set", "decode.neural_lm_steps=5",
            "--set", "decode.lm_order=0",
            "--synthetic", "8", "--beam",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "CER" in out
