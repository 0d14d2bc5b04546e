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


def test_sequential_export_rejected():
    cfg = base_config_dict(model="SRGNN", epochs=1)
    config = Config(config_dict=cfg)
    with pytest.raises(ValueError, match="sequential"):
        export_artifact(config, "/tmp/never.npz")


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
