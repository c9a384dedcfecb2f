"""Data pipeline tests: bucket determinism, mask correctness, host sharding
(SURVEY.md §7.1 stage 3)."""
import numpy as np

from tpu_ctc.config import DataConfig
from tpu_ctc.data.alphabet import Alphabet, DEFAULT_ALPHABET
from tpu_ctc.data.bucketing import BucketedLoader, make_batch
from tpu_ctc.data.synthetic import SyntheticCorpus


def small_cfg(**kw):
    base = dict(batch_size=4, max_frames=100, bucket_boundaries=(30, 60, 100),
                shuffle=True, seed=1, sortagrad=False)
    base.update(kw)
    return DataConfig(**base)


class TestAlphabet:
    def test_roundtrip(self):
        a = DEFAULT_ALPHABET
        ids = a.encode("hello world")
        assert a.decode(ids) == "hello world"
        assert a.blank == 0
        assert 0 not in ids

    def test_save_load(self, tmp_path):
        a = Alphabet("abc ")
        p = str(tmp_path / "alpha.txt")
        a.save(p)
        b = Alphabet.load(p)
        assert b.chars == a.chars
        assert b.encode("cab") == a.encode("cab")


class TestBatch:
    def test_padding_and_masks(self, rng):
        utts = [(rng.randn(t, 8).astype(np.float32),
                 rng.randint(1, 5, l).astype(np.int32))
                for t, l in [(10, 3), (20, 5), (15, 2)]]
        b = make_batch(utts, t_pad=25, l_pad=6, batch_size=4)
        assert b.feats.shape == (4, 25, 8)
        np.testing.assert_array_equal(b.frame_lengths[:3], [10, 20, 15])
        np.testing.assert_array_equal(b.label_lengths[:3], [3, 5, 2])
        np.testing.assert_array_equal(b.weights, [1, 1, 1, 0])
        # mask matches lengths; padding zeroed
        assert b.frame_mask[0].sum() == 10
        assert np.abs(b.feats[0, 10:]).max() == 0
        assert (b.labels[2, 2:] == 0).all()


class TestLoader:
    def make(self, n=40, cfg=None, **kw):
        corpus = SyntheticCorpus(num_utterances=n, feature_dim=8,
                                 frames_per_char=4, min_chars=2, max_chars=12)
        return BucketedLoader(corpus.all_utterances(), cfg or small_cfg(), **kw)

    def test_epoch_deterministic(self):
        l1, l2 = self.make(), self.make()
        b1 = [(c, b.shape_key, b.frame_lengths.tolist())
              for c, b in l1.epoch(3)]
        b2 = [(c, b.shape_key, b.frame_lengths.tolist())
              for c, b in l2.epoch(3)]
        assert b1 == b2

    def test_epochs_differ(self):
        loader = self.make()
        o1 = [b.frame_lengths.tolist() for _, b in loader.epoch(1)]
        o2 = [b.frame_lengths.tolist() for _, b in loader.epoch(2)]
        assert o1 != o2

    def test_every_utterance_once_per_epoch(self):
        loader = self.make()
        seen = 0
        for _, b in loader.epoch(0):
            seen += int(b.weights.sum())
        assert seen == len(loader.dataset) - loader.num_dropped

    def test_bucket_shapes_static(self):
        loader = self.make()
        keys = set(loader.shape_keys())
        for _, b in loader.epoch(0):
            assert b.shape_key in keys

    def test_host_sharding_disjoint_and_complete(self):
        cfg = small_cfg()
        full = self.make(cfg=cfg)
        shards = [self.make(cfg=cfg, host_id=h, num_hosts=2) for h in range(2)]
        as_keys = lambda plan: [(b, tuple(ids)) for b, ids in plan]
        full_plan = as_keys(full._epoch_order(0))
        shard_plans = [as_keys(s._epoch_order(0)) for s in shards]
        assert len(shard_plans[0]) + len(shard_plans[1]) == len(full_plan)
        assert not (set(shard_plans[0]) & set(shard_plans[1]))
        assert set(shard_plans[0]) | set(shard_plans[1]) == set(full_plan)

    def test_sortagrad_first_epoch(self):
        cfg = small_cfg(sortagrad=True, batch_size=2)
        loader = self.make(cfg=cfg)
        # within each bucket, first-epoch batches come in length order
        lengths = [b.frame_lengths.max() for _, b in loader.epoch(0)]
        assert lengths == sorted(lengths) or len(set(lengths)) <= 1

    def test_resume_cursor(self):
        loader = self.make()
        full = [(c, b.frame_lengths.tolist()) for c, b in loader.epoch(1)]
        resumed = [(c, b.frame_lengths.tolist())
                   for c, b in loader.epoch(1, start_batch=2)]
        assert resumed == full[2:]

    def test_overlong_dropped(self):
        cfg = small_cfg(bucket_boundaries=(10,))
        loader = self.make(cfg=cfg)
        assert loader.num_dropped > 0


class TestSynthetic:
    def test_deterministic(self):
        c1 = SyntheticCorpus(num_utterances=4, seed=7)
        c2 = SyntheticCorpus(num_utterances=4, seed=7)
        f1, l1 = c1.utterance(2)
        f2, l2 = c2.utterance(2)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)

    def test_labels_in_range(self):
        c = SyntheticCorpus(num_utterances=8)
        for i in range(8):
            _, l = c.utterance(i)
            assert (l >= 1).all() and (l < c.alphabet.size).all()
