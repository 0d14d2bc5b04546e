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


def test_social_dense_vs_sparse_propagation_equivalence():
    """Forced-sparse consts (COO Graphs) must propagate identically to
    the dense MXU path for all three social models (VERDICT r1 #5 —
    social family at 100k+ users runs without n² memory)."""
    import jax
    import numpy as np
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.ops.spmm import Graph
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation

    for name in ("DiffNet", "MHCN", "SEPT"):
        outs = []
        for sparse in (False, True):
            cfg = Config(config_dict=base_config_dict(
                model=name, enable_sparse=sparse))
            ds = create_dataset(cfg)
            (_, tr_ds), _, _ = data_preparation(cfg, ds)
            model = get_model(name)(cfg, tr_ds)
            if sparse:
                assert any(isinstance(v, Graph)
                           for v in model.consts.values()), name
            params = model.init_params(jax.random.PRNGKey(0))
            u, i = model.propagate(params, model.consts, {})
            outs.append((np.asarray(u), np.asarray(i)))
        np.testing.assert_allclose(outs[0][0], outs[1][0],
                                   rtol=2e-4, atol=2e-5, err_msg=name)
        np.testing.assert_allclose(outs[0][1], outs[1][1],
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_diffnet_pretrained_review(tmp_path):
    """DiffNet with frozen review embeddings from .user/.item files."""
    import os
    import shutil
    import numpy as np
    from conftest import TEST_DATA

    d = tmp_path / "test"
    d.mkdir()
    for suffix in ("inter", "net"):
        shutil.copy(os.path.join(TEST_DATA, "test", f"test.{suffix}"),
                    d / f"test.{suffix}")
    rng = np.random.default_rng(0)
    users = sorted({l.split("\t")[0] for i, l in enumerate(
        open(d / "test.inter")) if i > 0})
    items = sorted({l.split("\t")[1] for i, l in enumerate(
        open(d / "test.inter")) if i > 0})
    dim = 8
    with open(d / "test.user", "w") as f:
        f.write("user_id:token\tuser_review_emb:float_seq\n")
        for u in users:
            f.write(u + "\t" + " ".join(
                f"{v:.4f}" for v in rng.normal(size=dim)) + "\n")
    with open(d / "test.item", "w") as f:
        f.write("item_id:token\titem_review_emb:float_seq\n")
        for it in items:
            f.write(it + "\t" + " ".join(
                f"{v:.4f}" for v in rng.normal(size=dim)) + "\n")

    quick_test({"model": "DiffNet", "pretrained_review": True,
                "embedding_size": dim,
                "data_path": str(tmp_path),
                "load_col": {
                    "inter": ["user_id", "item_id", "rating", "timestamp"],
                    "net": ["source_id", "target_id"],
                    "user": ["user_id", "user_review_emb"],
                    "item": ["item_id", "item_review_emb"]}})
