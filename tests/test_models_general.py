"""End-to-end 1-epoch smoke tests, general family — the reference's
test strategy (tests/test_model.py:14-86) reproduced over the fixture."""

from conftest import base_config_dict

from recbole_gnn_tpu.quick_start import objective_function


def quick_test(config_dict):
    res = objective_function(config_dict=base_config_dict(**config_dict),
                             saved=False)
    assert "test_result" in res
    for v in res["test_result"].values():
        assert 0.0 <= v <= 1.0
    return res


def test_lightgcn():
    quick_test({"model": "LightGCN"})


def test_lightgcn_metrics_nontrivial():
    res = quick_test({"model": "LightGCN", "epochs": 3})
    assert res["test_result"]["recall@10"] > 0.0


def test_bpr():
    quick_test({"model": "BPR"})


def test_neumf():
    quick_test({"model": "NeuMF"})


def test_ngcf():
    quick_test({"model": "NGCF"})


def test_ngcf_node_dropout():
    quick_test({"model": "NGCF", "node_dropout": 0.2})


def test_simgcl():
    quick_test({"model": "SimGCL"})


def test_xsimgcl():
    quick_test({"model": "XSimGCL"})


def test_directau_mf():
    quick_test({"model": "DirectAU"})


def test_directau_lightgcn():
    quick_test({"model": "DirectAU", "encoder": "LightGCN"})


def test_ssl4rec():
    quick_test({"model": "SSL4REC"})


def test_sgl_ed():
    quick_test({"model": "SGL"})


def test_sgl_nd():
    quick_test({"model": "SGL", "type": "ND"})


def test_sgl_rw():
    quick_test({"model": "SGL", "type": "RW"})


def test_sgl_sparse_path():
    quick_test({"model": "SGL", "enable_sparse": True})


def test_ncl():
    quick_test({"model": "NCL", "num_clusters": 10})


def test_ncl_past_warmup():
    quick_test({"model": "NCL", "num_clusters": 10, "warm_up_step": 0,
                "epochs": 2})


def test_hmlet():
    quick_test({"model": "HMLET"})


def test_hmlet_past_warmup():
    quick_test({"model": "HMLET", "warm_up_epochs": 0, "epochs": 2})


def test_lightgcl():
    quick_test({"model": "LightGCL"})


def test_lightgcl_dropout():
    quick_test({"model": "LightGCL", "dropout": 0.2})


def test_lightgcl_sparse_branch():
    quick_test({"model": "LightGCL", "enable_sparse": True, "dropout": 0.2})


def test_lightgcl_sparse_matches_dense_forward():
    """Dense vs sparse LightGCL propagation must agree."""
    import jax
    import jax.numpy as jnp
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from recbole_gnn_tpu.models import get_model

    cfg_d = Config(config_dict=base_config_dict(model="LightGCL"))
    ds = create_dataset(cfg_d)
    (_, tr_ds), _, _ = data_preparation(cfg_d, ds)
    m_d = get_model("LightGCL")(cfg_d, tr_ds)
    cfg_s = Config(config_dict=base_config_dict(model="LightGCL",
                                                enable_sparse=True))
    m_s = get_model("LightGCL")(cfg_s, tr_ds)
    params = m_d.init_params(jax.random.PRNGKey(0))
    ud, idn = m_d.propagate(params, m_d.consts, {})
    us, isp = m_s.propagate(params, m_s.consts, {})
    import numpy as np
    np.testing.assert_allclose(np.asarray(ud), np.asarray(us),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(idn), np.asarray(isp),
                               rtol=2e-4, atol=2e-4)


def test_sgl_bf16_activations_quality():
    """activation_dtype: bfloat16 (the single-chip memory lever for
    web-scale SGL — results/gowalla.md) must track f32 metrics on the
    fixture: same pipeline/seed, 3 epochs, small absolute band."""
    f32 = quick_test({"model": "SGL", "epochs": 3, "seed": 2020})
    bf16 = quick_test({"model": "SGL", "epochs": 3, "seed": 2020,
                       "activation_dtype": "bfloat16"})
    for k in ("ndcg@10", "recall@10"):
        assert abs(f32["test_result"][k] - bf16["test_result"][k]) < 0.02


def test_sgl_bf16_sparse_path_quality():
    f32 = quick_test({"model": "SGL", "epochs": 3, "seed": 2020,
                      "enable_sparse": True})
    bf16 = quick_test({"model": "SGL", "epochs": 3, "seed": 2020,
                       "enable_sparse": True,
                       "activation_dtype": "bfloat16"})
    for k in ("ndcg@10", "recall@10"):
        assert abs(f32["test_result"][k] - bf16["test_result"][k]) < 0.02


def test_no_zero_swallowing_config_reads():
    """`config[k] or default` silently replaces legitimate 0 / 0.0 /
    False overrides (--eps=0.0 trained with 0.2 before commit 71a2f99);
    model code must use the None-safe ``config.get(k, default)``."""
    import pathlib
    import re
    root = pathlib.Path(__file__).resolve().parents[1] / "recbole_gnn_tpu"
    pat = re.compile(r'config\[[^\]]+\]\s+or\s')
    allowed = {"loss_type", "state", "checkpoint_dir", "eval_args",
               "learner", "valid_metric", "encoder", "type",
               "activation_function", "activation_dtype",
               "ITEM_ID_FIELD", "USER_ID_FIELD", "LIST_SUFFIX",
               "ITEM_LIST_LENGTH_FIELD", "NET_SOURCE_ID_FIELD",
               "NET_TARGET_ID_FIELD", "graph_edge_sharding_axis"}
    bad = []
    for p in sorted(root.rglob("*.py")):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            m = pat.search(line)
            if m and not any(f'"{k}"' in line or f"'{k}'" in line
                             for k in allowed):
                # numeric fallbacks where 0 is a meaningless override
                # (batch sizes, seq-len caps) are still flagged unless
                # guarded by max(1, ...)
                if "max(1," in line or "batch_size" in line \
                        or "MAX_ITEM_LIST_LENGTH" in line \
                        or "eval_step" in line \
                        or "learning_rate" in line \
                        or "dropout_probs" in line \
                        or "hidden_size_list" in line \
                        or "mlp_hidden_size" in line \
                        or "gate_layer_ids" in line \
                        or "gating_mlp_dims" in line:
                    continue
                bad.append(f"{p.relative_to(root)}:{i}: {line.strip()}")
    assert not bad, "zero-swallowing config reads:\n" + "\n".join(bad)


def test_zero_overrides_respected():
    """lambda1=0 / lambda2=0 (disable LightGCL's contrastive term — a
    legitimate ablation) must reach the model, not the yaml default."""
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    cfg = Config(config_dict=base_config_dict(
        model="LightGCL", lambda1=0.0, lambda2=0.0, seed=0))
    ds = create_dataset(cfg)
    (tr_loader, tr_ds), _, _ = data_preparation(cfg, ds)
    m = get_model("LightGCL")(cfg, tr_ds)
    assert m.lambda_1 == 0.0 and m.lambda_2 == 0.0
    assert tr_loader.seed == 0   # seed 0 must not fall back to 2020
