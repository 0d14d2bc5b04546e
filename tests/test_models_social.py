"""End-to-end 1-epoch smoke tests, social family (reference
tests/test_model.py:162-179)."""

from conftest import base_config_dict

from recbole_gnn_tpu.quick_start import objective_function


def quick_test(config_dict):
    res = objective_function(config_dict=base_config_dict(**config_dict),
                             saved=False)
    assert "test_result" in res
    for v in res["test_result"].values():
        assert 0.0 <= v <= 1.0
    return res


def test_diffnet():
    quick_test({"model": "DiffNet"})


def test_mhcn():
    quick_test({"model": "MHCN"})


def test_sept():
    quick_test({"model": "SEPT"})


def test_sept_past_warmup():
    quick_test({"model": "SEPT", "warm_up_epochs": 0, "epochs": 2})
