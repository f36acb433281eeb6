"""Config validation: reference YAML surface, strict unknown keys, and the
deformable-architecture config surface."""
import pytest

from pcrcg_tpu.config import Config, config_from_dict, tiny_test_config


def test_deformable_swaps_architecture():
    cfg = Config(deformable=True)
    assert "resnetb_deformable" in cfg.architecture
    assert "resnetb_deformable_strided" in cfg.architecture
    # modulated without any deformable block is a config error
    with pytest.raises(ValueError, match="modulated"):
        config_from_dict({"modulated": True})
    # explicit architecture list via YAML key
    cfg2 = config_from_dict({"architecture": ["simple", "resnetb_deformable",
                                              "nearest_upsample", "last_unary"],
                             "modulated": True})
    assert cfg2.architecture[1] == "resnetb_deformable"


def test_deformable_false_accepted():
    cfg = config_from_dict({"deformable": False, "modulated": False})
    assert not cfg.deformable


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        config_from_dict({"no_such_key": 1})


def test_data_parallel_key_live():
    cfg = tiny_test_config(data_parallel=4, batch_size=4)
    assert cfg.data_parallel == 4
