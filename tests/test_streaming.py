"""Streaming/lazy manifest dataset tests (SURVEY.md C7 at 300h scale):
metadata-only bucketing, lazy-equals-eager item parity, per-host shard
access, bounded payload reads, resumable cursor through the lazy path."""
import json
import os

import numpy as np
import pytest

from tpu_ctc.config import Config, DataConfig, FrontendConfig, get_config
from tpu_ctc.data import audio_io
from tpu_ctc.data.alphabet import DEFAULT_ALPHABET
from tpu_ctc.data.bucketing import BucketedLoader
from tpu_ctc.data.manifest import (ManifestDataset, load_manifest_dataset,
                                   write_manifest)


def _make_audio_corpus(root, n=24, rate=16000, seed=0):
    """On-disk WAV corpus with varied lengths; returns the manifest dir."""
    rng = np.random.RandomState(seed)
    records = []
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        sec = 0.5 + 1.5 * rng.rand()
        wav = (0.3 * np.sin(2 * np.pi * (200 + 50 * i)
                            * np.arange(int(sec * rate)) / rate)
               ).astype(np.float32)
        name = f"utt{i:03d}.wav"
        audio_io.write_wav(os.path.join(root, name), wav, rate)
        text = " ".join(["hello", "world", "test"][: 1 + i % 3])
        records.append({"id": f"utt{i:03d}", "audio": name, "text": text,
                        "samples": len(wav), "rate": rate})
    write_manifest(root, "train", records)
    return root


def _cfg():
    import dataclasses
    return dataclasses.replace(
        get_config("default"),
        frontend=FrontendConfig(sample_rate=16000, context=1, frame_stride=2),
        data=DataConfig(batch_size=4, max_frames=400,
                        bucket_boundaries=(60, 120, 250), seed=3,
                        shuffle=True, sortagrad=False),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_corpus"))
    return _make_audio_corpus(root)


class TestLazyDataset:
    def test_frame_lengths_without_payload_reads(self, corpus):
        ds = ManifestDataset(corpus, _cfg())
        fl = ds.frame_lengths
        assert ds.payload_reads == 0, "bucketing metadata must be header-only"
        assert len(fl) == len(ds) and (fl > 0).all()

    def test_lazy_matches_eager(self, corpus):
        cfg = _cfg()
        ds = ManifestDataset(corpus, cfg)
        eager = load_manifest_dataset(corpus, cfg)
        for i in [0, 5, len(ds) - 1]:
            f_lazy, l_lazy = ds[i]
            f_eager, l_eager = eager[i]
            np.testing.assert_array_equal(l_lazy, l_eager)
            np.testing.assert_allclose(f_lazy, f_eager, atol=1e-5)

    def test_metadata_lengths_match_actual(self, corpus):
        cfg = _cfg()
        ds = ManifestDataset(corpus, cfg)
        fl = ds.frame_lengths
        for i in range(0, len(ds), 7):
            feats, _ = ds[i]
            assert feats.shape[0] == fl[i], (
                f"utt {i}: metadata says {fl[i]}, payload gives {feats.shape[0]}")

    def test_loader_streams_only_consumed_batches(self, corpus):
        cfg = _cfg()
        ds = ManifestDataset(corpus, cfg)
        loader = BucketedLoader(ds, cfg.data)
        assert ds.payload_reads == 0, "loader construction must not read audio"
        it = loader.epoch(0)
        next(it)
        # One batch consumed -> at most batch_size payload reads.
        assert 0 < ds.payload_reads <= cfg.data.batch_size

    def test_host_shard_reads_only_its_items(self, corpus):
        cfg = _cfg()
        reads = []
        for host in range(2):
            ds = ManifestDataset(corpus, cfg)
            loader = BucketedLoader(ds, cfg.data, host_id=host, num_hosts=2)
            for _, _b in loader.epoch(0):
                pass
            reads.append(ds.payload_reads)
        ds_all = ManifestDataset(corpus, cfg)
        full = BucketedLoader(ds_all, cfg.data)
        for _, _b in full.epoch(0):
            pass
        # Each host reads a proper subset; both shards together cover no more
        # than the full pass (tail batches repeat utterances within a batch,
        # which are fresh reads, so allow equality-ish bounds).
        assert reads[0] < ds_all.payload_reads
        assert reads[1] < ds_all.payload_reads

    def test_same_batches_lazy_vs_eager(self, corpus):
        cfg = _cfg()
        lazy = BucketedLoader(ManifestDataset(corpus, cfg), cfg.data)
        eager = BucketedLoader(load_manifest_dataset(corpus, cfg), cfg.data)
        for (c1, b1), (c2, b2) in zip(lazy.epoch(0), eager.epoch(0)):
            assert c1 == c2
            np.testing.assert_allclose(b1.feats, b2.feats, atol=1e-5)
            np.testing.assert_array_equal(b1.labels, b2.labels)
            np.testing.assert_array_equal(b1.frame_lengths, b2.frame_lengths)

    def test_resume_mid_epoch(self, corpus):
        cfg = _cfg()
        loader = BucketedLoader(ManifestDataset(corpus, cfg), cfg.data)
        all_batches = list(loader.epoch(1))
        resumed = list(loader.epoch(1, start_batch=2))
        assert len(resumed) == len(all_batches) - 2
        for (c1, b1), (c2, b2) in zip(all_batches[2:], resumed):
            assert c1 == c2
            np.testing.assert_array_equal(b1.feats, b2.feats)

    def test_lru_cache_bounds(self, corpus):
        cfg = _cfg()
        ds = ManifestDataset(corpus, cfg, cache_items=4)
        for i in range(12):
            ds[i % 6]
        assert len(ds._cache) <= 4
        before = ds.payload_reads
        ds[5]  # cached (one of the last 4 touched)
        assert ds.payload_reads == before


class TestMixedManifest:
    def test_feats_and_audio_records(self, tmp_path):
        root = str(tmp_path)
        cfg = _cfg()
        rng = np.random.RandomState(0)
        feats = rng.randn(50, cfg.frontend.n_mels).astype(np.float32)
        np.save(os.path.join(root, "f.npy"), feats)
        wav = (0.2 * np.sin(2 * np.pi * 300 * np.arange(8000) / 16000)
               ).astype(np.float32)
        audio_io.write_sphere(os.path.join(root, "a.sph"), wav, 16000)
        write_manifest(root, "train", [
            {"id": "f", "feats": "f.npy", "text": "ab", "frames": 50},
            {"id": "a", "audio": "a.sph", "text": "cd",
             "samples": 8000, "rate": 16000},
        ])
        ds = ManifestDataset(root, cfg)
        fl = ds.frame_lengths
        assert ds.payload_reads == 0
        f0, _ = ds[0]
        f1, _ = ds[1]
        assert f0.shape[0] == fl[0] and f1.shape[0] == fl[1]
        # context stacking triples the feature dim at context=1
        assert f0.shape[1] == cfg.frontend.n_mels * 3

    def test_rate_mismatch_resamples(self, tmp_path):
        root = str(tmp_path)
        cfg = _cfg()  # wants 16 kHz
        wav8k = (0.2 * np.sin(2 * np.pi * 300 * np.arange(4000) / 8000)
                 ).astype(np.float32)
        audio_io.write_sphere(os.path.join(root, "u.sph"), wav8k, 8000,
                              coding="ulaw")
        write_manifest(root, "train", [
            {"id": "u", "audio": "u.sph", "text": "hi",
             "samples": 4000, "rate": 8000},
        ])
        ds = ManifestDataset(root, cfg)
        feats, _ = ds[0]
        assert feats.shape[0] == ds.frame_lengths[0]
