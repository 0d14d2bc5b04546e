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


def test_lessr_eopa_scan_path_matches_unroll():
    """Degenerate repetitive sessions push the mailbox K past the
    unroll cap — the lax.scan branch must produce exactly the unrolled
    result (r4 review: (B,K,L,L) unroll blowup guard)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import recbole_gnn_tpu.models.sequential.lessr as lessr_mod
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.data.session import build_lessr_graphs

    L = 20
    # one session alternating back to item 5 → in-degree 9 > 8
    seqs = np.zeros((4, L), np.int64)
    seqs[0, :19] = [5, 3, 5, 4, 5, 6, 5, 7, 5, 8, 5, 9, 5, 10, 5, 11,
                    5, 12, 5]
    seqs[1, :3] = [1, 2, 3]
    seqs[2, :2] = [7, 8]
    seqs[3, :4] = [2, 4, 2, 4]
    lens = np.array([19, 3, 2, 4], np.int64)
    graphs, _ = build_lessr_graphs(seqs, lens, L)
    batch = {k: jnp.asarray(v) for k, v in graphs.items()}
    K = batch["eop_mail"].shape[2]
    assert K > lessr_mod._EOPA_UNROLL_MAX_K

    cfg = Config(model="LESSR", dataset="synthetic",
                 config_dict={"data_path": "/nonexistent",
                              "embedding_size": 16, "n_layers": 2,
                              "batch_norm": False, "feat_drop": 0.0})

    class DS:
        n_users, n_items, inter_num = 1, 32, 4

    model = lessr_mod.LESSR(cfg, DS())
    params = model.init_params(jax.random.PRNGKey(0))
    feat = params["item_emb"][batch["x"]]
    nmask = jnp.arange(L)[None, :] < batch["n_nodes"][:, None]
    lp = params["layers"][0]
    _, out_scan = model._eopa(lp, feat, batch, nmask,
                              jax.random.PRNGKey(0), train=False)
    # force the unrolled branch on the same data
    old = lessr_mod._EOPA_UNROLL_MAX_K
    try:
        lessr_mod._EOPA_UNROLL_MAX_K = K
        _, out_unroll = model._eopa(lp, feat, batch, nmask,
                                    jax.random.PRNGKey(0), train=False)
    finally:
        lessr_mod._EOPA_UNROLL_MAX_K = old
    np.testing.assert_allclose(np.asarray(out_scan),
                               np.asarray(out_unroll),
                               rtol=1e-6, atol=1e-6)


def test_lessr_calibrated_eval_batch_invariant():
    """Trained LESSR checkpoints carry frozen population BN statistics
    (trainer serving_calibrate hook), and eval-mode scores computed
    with them are batch-size invariant — the torch reference's
    running-stats eval semantics (its BatchNorm1d eval mode)."""
    import jax
    import numpy as np

    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.quick_start import (create_dataset,
                                             data_preparation,
                                             run_recbole_gnn_tpu)
    from recbole_gnn_tpu.train.checkpoint import load_checkpoint

    cfg = base_config_dict(model="LESSR", epochs=1, seed=2020)
    run_recbole_gnn_tpu(config_dict=cfg, saved=True, verbose=False)
    config = Config(config_dict=cfg)
    state = load_checkpoint("/tmp/rgt_test_saved/LESSR-test.ckpt")
    assert "lessr_bn" in state.get("extras", {})

    ds = create_dataset(config)
    (_, tr_ds), _, (test_loader, _) = data_preparation(config, ds)
    model = get_model("LESSR")(config, tr_ds)
    batch = next(iter(test_loader))
    full = np.array(model.full_scores(
        state["params"], model.consts, state["extras"], batch,
        jax.random.PRNGKey(0), False))
    sub = {k: v[:2] for k, v in batch.items()}
    f2 = np.array(model.full_scores(
        state["params"], model.consts, state["extras"], sub,
        jax.random.PRNGKey(0), False))
    np.testing.assert_allclose(f2, full[:2], rtol=1e-5, atol=1e-5)
