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
