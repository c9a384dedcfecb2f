"""Config tree tests: presets, serialization, overrides."""
import pytest

from tpu_ctc.config import Config, PRESETS, get_config


class TestPresets:
    def test_five_baseline_presets_exist(self):
        # BASELINE.json's 5 configs, by ordinal alias.
        for i in "12345":
            assert i in PRESETS

    def test_preset_1_cpu_runnable_shape(self):
        c = get_config("1")
        assert c.model.num_bi_layers == 1
        assert c.model.input_dim == c.frontend.feature_dim

    def test_preset_5_model_sharded(self):
        c = get_config("5")
        assert c.mesh.model > 1
        assert c.model.hidden_dim >= 4096

    def test_all_presets_consistent_dims(self):
        for name in "12345":
            c = get_config(name)
            assert c.model.input_dim == c.frontend.feature_dim


class TestSerialization:
    def test_json_roundtrip(self):
        c = get_config("3")
        c2 = Config.from_json(c.to_json())
        assert c == c2

    def test_override(self):
        c = get_config("1").override(**{"model.hidden_dim": 999,
                                        "optim.learning_rate": 0.5})
        assert c.model.hidden_dim == 999
        assert c.optim.learning_rate == 0.5

    def test_override_unknown_path_raises(self):
        with pytest.raises(KeyError):
            get_config("1").override(**{"model.nope": 1})

    def test_from_dict_rejects_unknown_field(self):
        with pytest.raises(KeyError):
            Config.from_dict({"model": {"bogus": 3}})
