"""End-to-end 1-epoch smoke tests, sequential family (reference
tests/test_model.py:89-160)."""

from conftest import base_config_dict

from recbole_gnn_tpu.quick_start import objective_function


def quick_test(config_dict):
    res = objective_function(config_dict=base_config_dict(**config_dict),
                             saved=False)
    assert "test_result" in res
    for v in res["test_result"].values():
        assert 0.0 <= v <= 1.0
    return res


def test_srgnn():
    quick_test({"model": "SRGNN"})


def test_srgnn_uni100():
    quick_test({"model": "SRGNN",
                "eval_args": {"split": {"LS": "valid_and_test"},
                              "mode": "uni100", "order": "TO"}})


def test_srgnn_pop100():
    quick_test({"model": "SRGNN",
                "eval_args": {"split": {"LS": "valid_and_test"},
                              "mode": "pop100", "order": "TO"}})


def test_srgnn_bpr():
    quick_test({"model": "SRGNN", "loss_type": "BPR",
                "train_neg_sample_args": {"distribution": "uniform",
                                          "sample_num": 1}})


def test_niser():
    quick_test({"model": "NISER"})


def test_tagnn():
    quick_test({"model": "TAGNN"})


def test_gcsan():
    quick_test({"model": "GCSAN"})


def test_sgnnhn():
    quick_test({"model": "SGNNHN"})


def test_gru4rec():
    quick_test({"model": "GRU4Rec"})


def test_narm():
    quick_test({"model": "NARM"})


def test_sasrec():
    quick_test({"model": "SASRec"})


def test_gcegnn():
    quick_test({"model": "GCEGNN"})


def test_gcegnn_hop2(): 
    quick_test({"model": "GCEGNN", "hop": 2, "sample_num": 4})


def test_lessr():
    quick_test({"model": "LESSR"})
