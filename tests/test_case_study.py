"""Case-study / serving API ([recbole] utils/case_study.py parity):
full-catalog scoring + top-k for chosen users on a trained model."""

import jax
import numpy as np
from conftest import base_config_dict

from recbole_gnn_tpu.config.config import Config
from recbole_gnn_tpu.models import get_model
from recbole_gnn_tpu.ops.topk import NEG_INF
from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
from recbole_gnn_tpu.utils.case_study import (
    full_sort_scores, full_sort_topk, topk_items_by_token)


def _trained_like(model_name):
    cfg = Config(model=model_name, config_dict=base_config_dict())
    ds = create_dataset(cfg)
    (_, train_ds), _, _ = data_preparation(cfg, ds)
    model = get_model(model_name)(cfg, train_ds)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    extras = model.init_extras(rng)
    return model, params, extras, train_ds


def test_full_sort_scores_masks_history_and_pad():
    model, params, extras, train_ds = _trained_like("LightGCN")
    history = train_ds.history_matrix()
    uids = [u for u in (1, 2, 3) if len(history.get(u, ())) > 0]
    scores = np.asarray(full_sort_scores(uids, model, params, extras,
                                         history=history))
    assert scores.shape == (len(uids), model.n_items)
    assert (scores[:, 0] <= NEG_INF).all()
    for b, u in enumerate(uids):
        assert (scores[b, history[u]] <= NEG_INF).all()
    # unmasked columns are finite
    unmasked = np.ones(model.n_items, bool)
    unmasked[0] = False
    unmasked[history[uids[0]]] = False
    assert np.isfinite(scores[0, unmasked]).all()


def test_full_sort_topk_excludes_history():
    model, params, extras, train_ds = _trained_like("LightGCN")
    history = train_ds.history_matrix()
    uids = np.array([1, 2])
    sc, idx = full_sort_topk(uids, model, params, extras, 5,
                             history=history)
    sc, idx = np.asarray(sc), np.asarray(idx)
    assert idx.shape == (2, 5)
    assert (np.diff(sc, axis=1) <= 1e-6).all()      # descending
    for b, u in enumerate(uids):
        assert 0 not in idx[b]
        assert not set(idx[b]) & set(history.get(int(u), ()))


def test_full_sort_scores_nonfactorized():
    model, params, extras, _ = _trained_like("NeuMF")
    scores = np.asarray(full_sort_scores([1, 2], model, params, extras))
    assert scores.shape == (2, model.n_items)
    assert (scores[:, 0] <= NEG_INF).all()


def test_topk_by_token_roundtrip():
    model, params, extras, train_ds = _trained_like("LightGCN")
    i2t = train_ds.field2id_token[train_ds.uid_field]
    toks = [str(i2t[1]), str(i2t[2])]
    recs = topk_items_by_token(toks, model, params, extras, train_ds, 4)
    item_vocab = set(map(str, train_ds.field2id_token[train_ds.iid_field]))
    assert set(recs) == set(toks)
    for items in recs.values():
        assert len(items) == 4
        assert set(items) <= item_vocab
