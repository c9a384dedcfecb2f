"""Collective decode: data-sharded beam search on the 8-device mesh must
match the single-device decode exactly (SURVEY.md P7)."""
import jax
import numpy as np
import pytest

from tpu_ctc.config import Config, DataConfig, MeshConfig, ModelConfig
from tpu_ctc.data.bucketing import make_batch
from tpu_ctc.decode.collective import make_collective_decoder
from tpu_ctc.decode.lm import train_ngram_lm
from tpu_ctc.models import birnn
from tpu_ctc.parallel import mesh as mesh_lib
from tpu_ctc.train.loop import batch_to_device_dict

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def setup(rng, batch=8):
    cfg = Config(
        model=ModelConfig(input_dim=10, hidden_dim=16, num_pre_layers=1,
                          num_bi_layers=1, vocab_size=6,
                          compute_dtype="float32"),
        data=DataConfig(batch_size=batch, max_frames=24,
                        bucket_boundaries=(24,)),
        mesh=MeshConfig(data=-1, model=1, seq=1))
    params = birnn.init_params(jax.random.PRNGKey(0), cfg.model)
    utts = [(rng.randn(rng.randint(10, 24), 10).astype(np.float32),
             rng.randint(1, 6, 3).astype(np.int32)) for _ in range(batch)]
    batch_obj = make_batch(utts, t_pad=24, l_pad=6, batch_size=batch)
    return cfg, params, batch_to_device_dict(batch_obj)


@pytest.mark.parametrize("use_beam", [False, True])
def test_mesh_decode_matches_single_device(rng, use_beam):
    cfg, params, bd = setup(rng)
    lm = train_ngram_lm([np.array([1, 2, 3])] * 10, vocab_size=6, order=2)

    single = mesh_lib.make_mesh(MeshConfig(data=1, model=1, seq=1),
                                devices=jax.devices()[:1])
    full = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
    with single:
        d1 = make_collective_decoder(cfg, single, lm=lm, use_beam=use_beam,
                                     max_len=24)
        h1, l1 = d1(params, bd)
    with full:
        d8 = make_collective_decoder(cfg, full, lm=lm, use_beam=use_beam,
                                     max_len=24)
        h8, l8 = d8(params, bd)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h8))
    # outputs are replicated on every device
    assert len({s.device for s in h8.addressable_shards}) == 8


def test_mesh_decode_pallas_forward(rng):
    """Collective decode with the fused Pallas BiRNN forward (interpret
    mode): the shard_map wrap must keep it batch-sharded and exact."""
    import dataclasses
    cfg, params, bd = setup(rng)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, birnn_impl="pallas"))

    single = mesh_lib.make_mesh(MeshConfig(data=1, model=1, seq=1),
                                devices=jax.devices()[:1])
    full = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
    with single:
        h1, l1 = make_collective_decoder(cfg, single, use_beam=True,
                                         max_len=24)(params, bd)
    with full:
        h8, l8 = make_collective_decoder(cfg, full, use_beam=True,
                                         max_len=24)(params, bd)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h8))


def test_snake_assignment_balances_and_permutes():
    import jax.numpy as jnp

    from tpu_ctc.decode.collective import snake_assignment
    rng = np.random.RandomState(7)
    lens = jnp.asarray(rng.randint(10, 400, size=32), jnp.int32)
    perm = np.asarray(snake_assignment(lens, 8))
    # a permutation of 0..31
    assert sorted(perm.tolist()) == list(range(32))
    loads = [int(np.asarray(lens)[perm[s * 4:(s + 1) * 4]].sum())
             for s in range(8)]
    # snake-dealt loads: max shard within one max-utterance of min shard
    assert max(loads) - min(loads) <= int(np.asarray(lens).max())
    # and far better balanced than the contiguous split can be in the
    # adversarial case below
    lens_adv = jnp.asarray([400] * 4 + [10] * 28, jnp.int32)
    p2 = np.asarray(snake_assignment(lens_adv, 8))
    loads2 = [int(np.asarray(lens_adv)[p2[s * 4:(s + 1) * 4]].sum())
              for s in range(8)]
    assert max(loads2) <= 400 + 3 * 10  # one long utt per shard


def test_redistributed_decode_matches_unbalanced(rng):
    """Length-balanced redistribution (ring ppermute exchange) must be
    invisible in the results: same hypotheses, original order."""
    cfg, params, bd = setup(rng)
    # adversarial lengths: all long utts on shard 0 (before rebalancing)
    lens = np.array([24, 24, 23, 22, 10, 10, 10, 10], np.int32)
    bd = dict(bd)
    bd["frame_lengths"] = lens
    bd["frame_mask"] = (np.arange(24)[None, :] < lens[:, None]).astype(
        np.float32)
    lm = train_ngram_lm([np.array([1, 2, 3])] * 10, vocab_size=6, order=2)

    full = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
    with full:
        d_bal = make_collective_decoder(cfg, full, lm=lm, use_beam=True,
                                        max_len=24, redistribute=True)
        h_bal, l_bal = d_bal(params, bd)
        d_raw = make_collective_decoder(cfg, full, lm=lm, use_beam=True,
                                        max_len=24, redistribute=False)
        h_raw, l_raw = d_raw(params, bd)
    np.testing.assert_array_equal(np.asarray(l_bal), np.asarray(l_raw))
    np.testing.assert_array_equal(np.asarray(h_bal), np.asarray(h_raw))


def test_redistribution_emits_collectives(rng):
    """The redistribution path must actually exchange state over the mesh
    (ppermute ring + lengths all_gather inside the decode step)."""
    cfg, params, bd = setup(rng)
    full = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
    with full:
        d = make_collective_decoder(cfg, full, use_beam=True, max_len=24,
                                    redistribute=True)
        txt = d.lower(params, bd).compile().as_text()
    assert "collective-permute" in txt or "all-to-all" in txt
    assert "all-gather" in txt


def test_mesh_decode_neural_lm_matches_single_device(rng):
    """Collective decode with the GRU char LM routed through the fused
    kernel (per-beam state in VMEM) must equal the 1-device result."""
    from tpu_ctc.decode import neural_lm

    cfg, params, bd = setup(rng)
    nlm = neural_lm.init_params(
        jax.random.PRNGKey(3),
        neural_lm.CharRNNLMConfig(vocab_size=6, embed_dim=8, hidden_dim=16))

    single = mesh_lib.make_mesh(MeshConfig(data=1, model=1, seq=1),
                                devices=jax.devices()[:1])
    full = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
    with single:
        d1 = make_collective_decoder(cfg, single, nlm_params=nlm,
                                     use_beam=True, max_len=24)
        h1, l1 = d1(params, bd)
    with full:
        d8 = make_collective_decoder(cfg, full, nlm_params=nlm,
                                     use_beam=True, max_len=24)
        h8, l8 = d8(params, bd)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h8))


def test_mesh_decode_honors_pruning_knobs(rng):
    """char_topk/prune_logp must flow into the collective search (they
    were silently dropped before r5) — sharded equals single-device,
    and both differ from the exact (no-pruning) decode on inputs where
    aggressive pruning bites."""
    import dataclasses

    cfg, params, bd = setup(rng)
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, beam_width=8,
                                        char_topk=2, prune_logp=-3.0))
    single = mesh_lib.make_mesh(MeshConfig(data=1, model=1, seq=1),
                                devices=jax.devices()[:1])
    full = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
    with single:
        h1, l1 = make_collective_decoder(cfg, single, use_beam=True,
                                         max_len=24)(params, bd)
    with full:
        h8, l8 = make_collective_decoder(cfg, full, use_beam=True,
                                         max_len=24)(params, bd)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h8))
    # the knobs are live: exact decode differs somewhere on these inputs
    cfg0 = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, char_topk=0,
                                        prune_logp=None))
    with single:
        h0, l0 = make_collective_decoder(cfg0, single, use_beam=True,
                                         max_len=24)(params, bd)
    assert not (np.array_equal(np.asarray(h0), np.asarray(h1))
                and np.array_equal(np.asarray(l0), np.asarray(l1)))


def test_mesh_decode_wide_beam_matches_single_device(rng):
    """K=160 routes the collective search through the 2-bank wide
    kernel; sharded must equal single-device."""
    import dataclasses

    cfg, params, bd = setup(rng)
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, beam_width=160))
    single = mesh_lib.make_mesh(MeshConfig(data=1, model=1, seq=1),
                                devices=jax.devices()[:1])
    full = mesh_lib.make_mesh(MeshConfig(data=-1, model=1, seq=1))
    with single:
        h1, l1 = make_collective_decoder(cfg, single, use_beam=True,
                                         max_len=24)(params, bd)
    with full:
        h8, l8 = make_collective_decoder(cfg, full, use_beam=True,
                                         max_len=24)(params, bd)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h8))
