"""Frontend tests: STFT/mel parity vs an independent numpy oracle
(SURVEY.md §7.1 stage 2: "parity vs a scipy reference oracle")."""
import jax.numpy as jnp
import numpy as np

from tpu_ctc.config import FrontendConfig
from tpu_ctc.frontend import features as F


def numpy_stft_power(x, cfg):
    """Independent numpy STFT implementation (the oracle)."""
    n = len(x)
    t = 1 + (n - cfg.frame_length) // cfg.hop_length
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.frame_length)
                             / cfg.frame_length)
    out = np.zeros((t, cfg.n_fft // 2 + 1))
    for i in range(t):
        fr = x[i * cfg.hop_length: i * cfg.hop_length + cfg.frame_length] * win
        spec = np.fft.rfft(fr, n=cfg.n_fft)
        out[i] = np.abs(spec) ** 2
    return out


class TestSTFT:
    def test_power_matches_numpy_oracle(self, rng):
        cfg = FrontendConfig()
        x = rng.randn(16000).astype(np.float32)
        got = np.asarray(F.stft_power(jnp.asarray(x), cfg))
        want = numpy_stft_power(x, cfg)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_pure_tone_peak_bin(self):
        cfg = FrontendConfig()
        freq = 1000.0
        t = np.arange(16000) / cfg.sample_rate
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        power = np.asarray(F.stft_power(jnp.asarray(x), cfg))
        peak_bin = power.mean(axis=0).argmax()
        expected = round(freq * cfg.n_fft / cfg.sample_rate)
        assert abs(int(peak_bin) - expected) <= 1

    def test_batched_matches_single(self, rng):
        cfg = FrontendConfig()
        xs = rng.randn(3, 8000).astype(np.float32)
        batched = np.asarray(F.log_mel(jnp.asarray(xs), cfg))
        for i in range(3):
            single = np.asarray(F.log_mel(jnp.asarray(xs[i]), cfg))
            np.testing.assert_allclose(batched[i], single, rtol=1e-5)


class TestMel:
    def test_filterbank_shape_and_coverage(self):
        cfg = FrontendConfig()
        fb = F.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                              cfg.fmin, cfg.fmax)
        assert fb.shape == (cfg.n_fft // 2 + 1, cfg.n_mels)
        assert (fb >= 0).all()
        # every filter has some support
        assert (fb.sum(axis=0) > 0).all()

    def test_mel_scale_monotone_centers(self):
        cfg = FrontendConfig()
        fb = F.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                              cfg.fmin, cfg.fmax)
        centers = fb.argmax(axis=0)
        assert (np.diff(centers) >= 0).all()


class TestCMVN:
    def test_masked_stats(self, rng):
        feats = rng.randn(2, 10, 4).astype(np.float32) * 3 + 1
        mask = np.ones((2, 10), np.float32)
        mask[1, 6:] = 0
        out = np.asarray(F.cmvn(jnp.asarray(feats), jnp.asarray(mask)))
        # valid region is normalized
        v = out[1, :6]
        np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(v.std(axis=0), 1.0, atol=1e-2)
        # padding zeroed
        np.testing.assert_allclose(out[1, 6:], 0.0)


class TestContext:
    def test_stacking(self, rng):
        feats = rng.randn(1, 5, 3).astype(np.float32)
        out = np.asarray(F.stack_context(jnp.asarray(feats), 1))
        assert out.shape == (1, 5, 9)
        # middle frame t=2: context is frames 1,2,3
        np.testing.assert_allclose(out[0, 2, :3], feats[0, 1])
        np.testing.assert_allclose(out[0, 2, 3:6], feats[0, 2])
        np.testing.assert_allclose(out[0, 2, 6:], feats[0, 3])
        # edge padding at t=0: left context replicates frame 0
        np.testing.assert_allclose(out[0, 0, :3], feats[0, 0])


class TestEndToEnd:
    def test_extract_features_shapes_and_mask(self, rng):
        cfg = FrontendConfig(context=1)
        x = rng.randn(2, 16000).astype(np.float32)
        feats, mask = F.extract_features(
            jnp.asarray(x), cfg, jnp.array([16000, 4000]))
        assert feats.shape[-1] == cfg.feature_dim
        n1 = F.frame_lengths_from_samples(np.array([16000, 4000]), cfg)
        np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), n1)
        # padded frames are zero
        assert np.abs(np.asarray(feats)[1, n1[1]:]).max() == 0.0


class TestPreemphasisDither:
    def test_preemphasis_matches_numpy_reference(self, rng):
        """Whole-waveform pre-emphasis y[n] = x[n] - c*x[n-1] (y[0]=x[0])
        through the frontend == applying it in numpy first."""
        import dataclasses

        from tpu_ctc.config import FrontendConfig
        from tpu_ctc.frontend.features import extract_features

        cfg0 = FrontendConfig(n_mels=20)
        cfg_pe = dataclasses.replace(cfg0, preemphasis=0.97)
        x = rng.randn(2, 4000).astype(np.float32)
        lens = np.array([4000, 3200], np.int32)
        # numpy oracle: pre-emphasize, then run the plain frontend
        y = x.copy()
        y[:, 1:] = x[:, 1:] - 0.97 * x[:, :-1]
        f_ref, m_ref = extract_features(jnp.asarray(y), cfg0,
                                        jnp.asarray(lens))
        f_pe, m_pe = extract_features(jnp.asarray(x), cfg_pe,
                                      jnp.asarray(lens))
        np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_pe))
        np.testing.assert_allclose(np.asarray(f_pe), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_dither_reproducible_and_bounded(self, rng):
        import dataclasses

        import jax

        from tpu_ctc.config import FrontendConfig
        from tpu_ctc.frontend.features import extract_features

        cfg0 = FrontendConfig(n_mels=20)
        cfg_d = dataclasses.replace(cfg0, dither=1.0 / 32768.0)
        x = jnp.asarray(rng.randn(1, 4000).astype(np.float32) * 0.1)
        lens = jnp.asarray([4000], jnp.int32)
        f0, _ = extract_features(x, cfg0, lens)
        key = jax.random.PRNGKey(3)
        f1, _ = extract_features(x, cfg_d, lens, dither_key=key)
        f2, _ = extract_features(x, cfg_d, lens, dither_key=key)
        # same key -> identical; tiny dither barely perturbs features
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        assert not np.array_equal(np.asarray(f1), np.asarray(f0))
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=0.5)

    def test_defaults_are_reference_neutral(self):
        from tpu_ctc.config import FrontendConfig
        cfg = FrontendConfig()
        assert cfg.preemphasis == 0.0 and cfg.dither == 0.0
