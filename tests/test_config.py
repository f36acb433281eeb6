"""Config validation: reference YAML surface, strict unknown keys, and the
hard-reject of the unimplemented deformable branch."""
import pytest

from pcrcg_tpu.config import Config, config_from_dict, tiny_test_config


def test_deformable_rejected():
    with pytest.raises(NotImplementedError, match="deformable"):
        Config(deformable=True)
    with pytest.raises(NotImplementedError, match="deformable"):
        config_from_dict({"modulated": True})


def test_deformable_false_accepted():
    cfg = config_from_dict({"deformable": False, "modulated": False})
    assert not cfg.deformable


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        config_from_dict({"no_such_key": 1})


def test_data_parallel_key_live():
    cfg = tiny_test_config(data_parallel=4, batch_size=4)
    assert cfg.data_parallel == 4
