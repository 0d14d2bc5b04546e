"""Serving path: artifact export, query server, HTTP endpoint.

Net-new vs the reference (which has no serving layer); the query
semantics must match the evaluator's full-sort convention — PAD item
and observed history masked to -inf.
"""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from conftest import base_config_dict
from recbole_gnn_tpu.config import Config
from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
from recbole_gnn_tpu.serve import RecServer, export_artifact, make_http_server

ART = "/tmp/rgt_test_saved/lightgcn_serve.npz"


@pytest.fixture(scope="module")
def artifact():
    cfg = base_config_dict(model="LightGCN", epochs=1, seed=2020)
    run_recbole_gnn_tpu(config_dict=cfg, saved=True, verbose=False)
    config = Config(config_dict=cfg)
    return export_artifact(config, ART)


def test_export_and_query(artifact):
    srv = RecServer(artifact)
    users = [str(srv.user_tokens[1]), str(srv.user_tokens[2])]
    items, scores = srv.recommend(users, k=5)
    assert len(items) == 2 and all(len(r) == 5 for r in items)
    assert scores.shape == (2, 5)
    # scores sorted descending, finite (top-5 of a 1k catalog can't
    # hit the -inf mask)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    assert np.all(np.isfinite(scores))


def test_history_and_pad_masked(artifact):
    srv = RecServer(artifact)
    u_tok = str(srv.user_tokens[1])
    idx, _ = srv.recommend([u_tok], k=10, return_tokens=False)
    # PAD item never recommended
    assert 0 not in idx[0]
    # no observed item (mask_splits="all") is recommended
    s, e = srv._hist_indptr[1], srv._hist_indptr[2]
    hist = set(srv._hist_items[s:e].tolist())
    assert hist, "fixture user 1 must have history"
    assert not hist.intersection(idx[0].tolist())
    # unmasked query MAY include history and must score >= masked top-1
    idx_un, sc_un = srv.recommend([u_tok], k=10, mask_history=False,
                                  return_tokens=False)
    assert 0 not in idx_un[0]   # PAD stays masked regardless


def test_query_matches_case_study_semantics(artifact):
    """Server top-k == direct masked matmul over the artifact tables."""
    srv = RecServer(artifact)
    uid = 3
    scores = np.array(srv.user_table[uid] @ srv.item_table.T)
    s, e = srv._hist_indptr[uid], srv._hist_indptr[uid + 1]
    scores[srv._hist_items[s:e]] = -np.inf
    scores[0] = -np.inf
    want = np.argsort(-scores)[:10]
    got, _ = srv.recommend([str(srv.user_tokens[uid])], k=10,
                           return_tokens=False)
    assert list(got[0]) == list(want)


def test_unknown_user_raises(artifact):
    srv = RecServer(artifact)
    with pytest.raises(KeyError):
        srv.recommend(["no-such-user-token"], k=5)


def test_http_roundtrip(artifact):
    srv = RecServer(artifact)
    httpd = make_http_server(srv, "127.0.0.1", 0)   # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["model"] == "LightGCN"

        body = json.dumps({"users": [str(srv.user_tokens[1])],
                           "k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["items"][0]) == 3
        assert len(out["scores"][0]) == 3

        # bad request: unknown user → 400, not a crash
        bad = json.dumps({"users": ["nope"], "k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend", data=bad,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()


def test_mask_splits_tiers(artifact):
    """history size ordering: train ⊆ train+valid ⊆ all — the three
    masking conventions (validation / test-evaluator / production)."""
    cfg = base_config_dict(model="LightGCN", epochs=1, seed=2020)
    config = Config(config_dict=cfg)
    sizes = {}
    for ms in ("train", "train+valid", "all"):
        p = f"/tmp/rgt_test_saved/lightgcn_serve_{ms.replace('+', '')}.npz"
        export_artifact(config, p, mask_splits=ms)
        sizes[ms] = len(RecServer(p)._hist_items)
    assert sizes["train"] < sizes["train+valid"] < sizes["all"]


def test_sequential_export_rejected():
    cfg = base_config_dict(model="SRGNN", epochs=1)
    config = Config(config_dict=cfg)
    with pytest.raises(ValueError, match="sequential"):
        export_artifact(config, "/tmp/never.npz")


def test_mesh_list_shorthand_and_empty_users(artifact):
    """mesh_shape=[8] (list shorthand, no 'tp' axis name) must work —
    items shard over the mesh's first axis — and an empty users list
    returns an empty result instead of raising."""
    srv1 = RecServer(artifact)
    srv8 = RecServer(artifact, mesh_shape=[8])
    users = [str(srv1.user_tokens[u]) for u in (1, 2, 3)]
    i1, _ = srv1.recommend(users, k=10, return_tokens=False)
    i8, _ = srv8.recommend(users, k=10, return_tokens=False)
    assert np.array_equal(np.asarray(i1), np.asarray(i8))
    items, scores = srv1.recommend([], k=5)
    assert items == [] and scores.shape == (0, 5)


def test_mesh_full_history_row_pad_masked(artifact):
    """A user whose history exactly fills the pow2 width bucket must
    still never see the PAD item (id 0) on the mesh path: the scorer
    appends a zeros column (evaluator convention) so the mask covers
    PAD even with no incidental zero padding in the row."""
    srv = RecServer(artifact, mesh_shape={"tp": 8})
    # craft: user 1 has exactly 4 history items -> w = 4, row full
    srv._hist_indptr = np.full(srv.n_users + 1, 4, dtype=np.int64)
    srv._hist_indptr[:2] = 0
    srv._hist_items = np.array([1, 2, 3, 4], dtype=np.int64)
    # force PAD + history to the top of the unmasked ranking
    srv.user_table = srv.user_table.at[1].set(1.0)
    srv.item_table = srv.item_table.at[:5].set(100.0)
    idx, _ = srv.recommend([str(srv.user_tokens[1])], k=10,
                           return_tokens=False)
    assert 0 not in idx[0]
    assert not {1, 2, 3, 4}.intersection(idx[0].tolist())


def test_cli_query_mesh_shape_string(artifact, capsys):
    """The CLI --mesh_shape flag takes the yaml string form ('[8]' /
    '{tp: 8}') and must be coerced before reaching make_mesh."""
    from recbole_gnn_tpu import serve
    tok = str(RecServer(artifact).user_tokens[1])
    serve.main(["query", "--artifact", artifact, "--users", tok,
                "-k", "3", "--mesh_shape", "[8]"])
    out = capsys.readouterr().out
    assert tok in out and ":" in out


def test_mesh_serving_matches_single_device(artifact):
    """Item-sharded distributed top-k serving (mesh_shape={'tp': 8} on
    the CPU test mesh) must return the same recommendations as the
    single-device path, including the catalog pad-to-shard handling
    (fixture catalog is not divisible by 8)."""
    srv1 = RecServer(artifact)
    srv8 = RecServer(artifact, mesh_shape={"tp": 8})
    assert srv8.item_table.shape[0] % 8 == 0
    users = [str(srv1.user_tokens[u]) for u in (1, 2, 3, 5, 8)]
    i1, _ = srv1.recommend(users, k=10, return_tokens=False)
    i8, _ = srv8.recommend(users, k=10, return_tokens=False)
    assert np.array_equal(np.asarray(i1), np.asarray(i8))


# -- session serving ------------------------------------------------------

@pytest.fixture(scope="module")
def srgnn_ckpt():
    cfg = base_config_dict(model="SRGNN", epochs=1, seed=2020)
    run_recbole_gnn_tpu(config_dict=cfg, saved=True, verbose=False)
    return cfg


def test_session_server_matches_eval_path(srgnn_ckpt):
    """Serving a session lifted straight from the eval split must score
    identically to the training-path full_scores on the loader batch —
    token mapping + graph construction + encoder all round-trip."""
    import jax

    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from recbole_gnn_tpu.serve import SessionServer

    config = Config(config_dict=dict(srgnn_ckpt))
    srv = SessionServer(config)

    ds = create_dataset(config)
    _, _, (test_loader, test_ds) = data_preparation(config, ds)
    batch = next(iter(test_loader))
    row = 0
    n = int(batch["item_seq_len"][row])
    sess_tokens = [str(srv.item_tokens[i])
                   for i in batch["item_seq"][row][:n]]
    got_idx, got_vals = srv.recommend([sess_tokens], k=10,
                                      return_tokens=False)

    scores = np.array(srv.model.full_scores(
        srv.params, srv.consts, srv.extras, batch,
        jax.random.PRNGKey(0), False))[row]
    scores[0] = -np.inf
    want = np.argsort(-scores)[:10]
    assert list(got_idx[0]) == list(want)
    assert 0 not in got_idx[0]


def test_session_server_no_graph_model(srgnn_ckpt):
    """GRU4Rec sits on plain SequentialDataset (no graph arrays)."""
    from recbole_gnn_tpu.serve import SessionServer
    cfg = base_config_dict(model="GRU4Rec", epochs=1, seed=2020)
    run_recbole_gnn_tpu(config_dict=cfg, saved=True, verbose=False)
    srv = SessionServer(Config(config_dict=cfg))
    toks = [str(srv.item_tokens[i]) for i in (3, 5, 7)]
    items, scores = srv.recommend([toks, toks[:2]], k=5)
    assert len(items) == 2 and all(len(r) == 5 for r in items)
    assert np.all(np.isfinite(scores))
    # empty batch path
    items, scores = srv.recommend([], k=5)
    assert items == [] and scores.shape == (0, 5)


def test_session_server_rejects_nonsequential(srgnn_ckpt):
    from recbole_gnn_tpu.serve import SessionServer
    cfg = Config(config_dict=base_config_dict(model="LightGCN"))
    with pytest.raises(ValueError, match="sequential"):
        SessionServer(cfg)


@pytest.mark.parametrize("model", ["LESSR", "GCEGNN"])
def test_session_server_specialized_datasets(model):
    """LESSR (EOP mailbox + shortcut graph) and GCE-GNN (reversed
    sessions + typed edges) serve through the same construction path
    training uses — verify against the eval-split loader batch."""
    import jax

    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from recbole_gnn_tpu.serve import SessionServer

    cfg = base_config_dict(model=model, epochs=1, seed=2020)
    run_recbole_gnn_tpu(config_dict=cfg, saved=True, verbose=False)
    config = Config(config_dict=cfg)
    srv = SessionServer(config)

    ds = create_dataset(config)
    _, _, (test_loader, _) = data_preparation(config, ds)
    batch = next(iter(test_loader))
    row = 0
    n = int(batch["item_seq_len"][row])
    sess = batch["item_seq"][row][:n]
    if model == "GCEGNN":
        sess = sess[::-1]          # loader sessions are stored reversed
    sess_tokens = [str(srv.item_tokens[i]) for i in sess]
    got_idx, _ = srv.recommend([sess_tokens], k=10, return_tokens=False)

    scores = np.array(srv.model.full_scores(
        srv.params, srv.consts, srv.extras, batch,
        jax.random.PRNGKey(0), False))[row]
    scores[0] = -np.inf
    want = np.argsort(-scores)[:10]
    assert list(got_idx[0]) == list(want)


def test_session_http_roundtrip(srgnn_ckpt):
    from recbole_gnn_tpu.serve import SessionServer
    srv = SessionServer(Config(config_dict=dict(srgnn_ckpt)))
    httpd = make_http_server(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        toks = [str(srv.item_tokens[i]) for i in (3, 5)]
        body = json.dumps({"sessions": [toks], "k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["items"][0]) == 3 and len(out["scores"][0]) == 3
        # unknown item token -> 400
        bad = json.dumps({"sessions": [["nope"]], "k": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend", data=bad,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
