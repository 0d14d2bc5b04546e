"""Production serving path: export a trained model to a standalone
artifact, then answer top-k recommendation queries from it.

The reference has no serving layer; its closest surface is [recbole]
``utils/case_study.py`` (mirrored here in ``utils/case_study.py``),
which needs the full dataset + model objects resident.  For deployment
that is the wrong shape: every factorized model (every general/social
model except NeuMF — ``models/base.py factorized_eval``) collapses at
serving time to two dense tables — propagate once, then every query is
one (B, d) x (d, n_items) MXU matmul + masked top-k.  So the serving
artifact IS those tables plus the token vocabularies and the user
history (for the mask), and the query path never touches the training
stack.

TPU-first shape of the query path:
- scoring is a single MXU matmul per user chunk (``ops/topk.py``
  ``chunked_full_sort_topk``) — static shapes, jit-cached per (B, k);
- top-k rides the exact-ApproxTopK route on big catalogs
  (``masked_topk``: recall_target=1.0 == exact, ~8x faster than the
  sort lax.top_k lowers to — measured r4, results/gowalla.md);
- multi-chip catalogs use the item-sharded distributed top-k
  (``parallel/topk.py``) — pass ``mesh_shape`` at export/query time.

Sequential models score *sessions*, not user ids — a static artifact
cannot capture a session encoder, so they are served by
``SessionServer`` (rebuilds the model from its checkpoint once, then
answers ad-hoc token-list sessions).  NeuMF (non-factorized MLP
scorer) raises a clear error from ``export_artifact``.

CLI:
  python -m recbole_gnn_tpu.serve export -m LightGCN -d ml-100k \
      [--config_files ...] [--checkpoint saved/LightGCN-ml-100k.ckpt] \
      --out /tmp/lightgcn.artifact.npz
  python -m recbole_gnn_tpu.serve query --artifact /tmp/... \
      --users 196 186 22 -k 10
  python -m recbole_gnn_tpu.serve http --artifact /tmp/... --port 8080
      # POST /recommend {"users": ["196"], "k": 10}; GET /healthz
  python -m recbole_gnn_tpu.serve session -m SRGNN -d diginetica \
      --session 214716935 214832672 -k 10        # one-shot
  python -m recbole_gnn_tpu.serve session -m SRGNN -d diginetica \
      --http 8081   # POST /recommend {"sessions": [[...]], "k": 10}
"""

from __future__ import annotations

import json
import os

import numpy as np

ARTIFACT_VERSION = 1


# -- export -------------------------------------------------------------

def export_artifact(config, out_path: str, checkpoint_path: str | None = None,
                    mask_splits: str = "all", compress: bool = False) -> str:
    """Propagate a trained checkpoint once and write the serving artifact.

    ``config``: a ``Config`` (or kwargs via ``export_artifact_from_args``).
    ``checkpoint_path``: defaults to the trainer's save path
    (``{checkpoint_dir}/{model}-{dataset}.ckpt``).
    ``mask_splits``: which observed interactions the server masks out of
    recommendations — ``"all"`` (train+valid+test; the production
    convention: never re-recommend anything the user has seen),
    ``"train+valid"`` (the test-time evaluator convention — lets the
    artifact reproduce offline test metrics exactly), or ``"train"``
    (the validation-time convention).
    """
    import jax

    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.quick_start import (apply_backend_config,
                                             create_dataset,
                                             data_preparation)
    from recbole_gnn_tpu.train.checkpoint import load_checkpoint
    from recbole_gnn_tpu.utils.enums import ModelType

    apply_backend_config(config)
    if config["MODEL_TYPE"] == ModelType.SEQUENTIAL:
        raise ValueError(
            "sequential models score sessions, not user ids — serve them "
            "from a checkpoint via quick_start/model.full_scores")
    ds = create_dataset(config)
    (train_loader, train_ds), (_, valid_ds), (_, test_ds) = \
        data_preparation(config, ds)
    del train_loader
    model = get_model(config["model"])(config, train_ds)
    if not model.factorized_eval:
        raise ValueError(
            f"{config['model']} has no factorized eval form; serve it "
            "from a checkpoint (score_users_vs_all)")

    ckpt = checkpoint_path or os.path.join(
        config["checkpoint_dir"] or "saved/",
        f"{config['model']}-{config['dataset']}.ckpt")
    state = load_checkpoint(ckpt)
    params, extras = state["params"], state.get("extras", {})
    user_table, item_table = jax.jit(model.propagate)(
        params, model.consts, extras)
    user_table = np.asarray(user_table, dtype=np.float32)
    item_table = np.asarray(item_table, dtype=np.float32)

    splits = {"all": (train_ds, valid_ds, test_ds),
              "train+valid": (train_ds, valid_ds),
              "train": (train_ds,)}[mask_splits]
    users = np.concatenate([s.user_item_arrays()[0] for s in splits])
    items = np.concatenate([s.user_item_arrays()[1] for s in splits])
    order = np.argsort(users, kind="stable")
    hist_items = items[order].astype(np.int64)
    hist_indptr = np.searchsorted(users[order],
                                  np.arange(train_ds.n_users + 1))

    meta = {
        "version": ARTIFACT_VERSION,
        "model": str(config["model"]),
        "dataset": str(config["dataset"]),
        "n_users": int(train_ds.n_users),
        "n_items": int(train_ds.n_items),
        "dim": int(user_table.shape[1]),
        "mask_splits": mask_splits,
        "checkpoint": ckpt,
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = f"{out_path}.tmp.{os.getpid()}"
    # uncompressed by default: deflate on near-random f32 tables saves
    # ~20% size for minutes of host CPU at web-scale catalogs (1.3M×64
    # measured); opt in with compress=True for cold storage
    writer = np.savez_compressed if compress else np.savez
    try:
        with open(tmp, "wb") as f:
            writer(
                f,
                user_table=user_table, item_table=item_table,
                hist_indptr=hist_indptr.astype(np.int64),
                hist_items=hist_items,
                user_tokens=np.asarray(
                    train_ds.field2id_token[train_ds.uid_field], dtype=object),
                item_tokens=np.asarray(
                    train_ds.field2id_token[train_ds.iid_field], dtype=object),
                meta=np.frombuffer(
                    json.dumps(meta).encode(), dtype=np.uint8),
            )
        os.replace(tmp, out_path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return out_path


# -- shared serving plumbing ---------------------------------------------

def _pad_to_bucket(n: int, buckets) -> int:
    """Next batch bucket ≥ n (beyond the last: round up to its multiple)
    — jit caches stay warm and bounded."""
    for b in buckets:
        if n <= b:
            return b
    return -(-n // buckets[-1]) * buckets[-1]


def _resolve_tokens(tokens, mapping: dict, kind: str) -> list:
    out = []
    for t in tokens:
        tok = str(t)
        if tok not in mapping:
            raise KeyError(f"unknown {kind} token {tok!r}")
        out.append(mapping[tok])
    return out


def _empty_result(k: int, return_tokens: bool):
    empty = np.zeros((0, k), dtype=np.float32)
    return ([] if return_tokens
            else np.zeros((0, k), dtype=np.int64)), empty


# -- server -------------------------------------------------------------

class RecServer:
    """Standalone query server over an exported artifact.

    Queries never touch the training stack: the artifact holds the
    propagated tables, vocabularies and history.  ``recommend`` is the
    single public call; the underlying scorer is jitted once per
    (batch-bucket, k) and reused.
    """

    #: queries are padded up to the next bucket so jit caches stay warm
    BATCH_BUCKETS = (1, 8, 64, 256, 1024)

    def __init__(self, artifact_path: str, mesh_shape=None):
        import jax.numpy as jnp

        with np.load(artifact_path, allow_pickle=True) as z:
            self.meta = json.loads(bytes(z["meta"]).decode())
            if self.meta.get("version") != ARTIFACT_VERSION:
                raise ValueError(
                    f"artifact version {self.meta.get('version')} != "
                    f"{ARTIFACT_VERSION}")
            self.user_table = jnp.asarray(z["user_table"])
            self.item_table = jnp.asarray(z["item_table"])
            self._hist_indptr = z["hist_indptr"]
            self._hist_items = z["hist_items"]
            self.user_tokens = z["user_tokens"]
            self.item_tokens = z["item_tokens"]
        self.n_users, self.n_items = self.meta["n_users"], self.meta["n_items"]
        self._token2uid = {str(t): i for i, t in enumerate(self.user_tokens)}
        self._mesh = None
        if mesh_shape:
            import jax.numpy as jnp

            from recbole_gnn_tpu.parallel.mesh import make_mesh
            self._mesh = make_mesh(mesh_shape)
            # items shard over 'tp' when the mesh has one, else over
            # the mesh's first axis (list shorthand [8] → {'dp': 8})
            self._shard_axis = ("tp" if "tp" in self._mesh.axis_names
                                else self._mesh.axis_names[0])
            # the item-sharded top-k needs n_items % n_shards == 0;
            # pad with PAD rows and pass the real size as n_valid_items
            shards = self._mesh.shape[self._shard_axis]
            pad = (-self.item_table.shape[0]) % shards
            if pad:
                self.item_table = jnp.pad(self.item_table,
                                          ((0, pad), (0, 0)))
        self._jit_cache = {}

    # .. internals ..

    def _bucket(self, n: int) -> int:
        return _pad_to_bucket(n, self.BATCH_BUCKETS)

    def _scorer(self, batch: int, k: int):
        key = (batch, k)
        if key not in self._jit_cache:
            import jax
            import jax.numpy as jnp

            from recbole_gnn_tpu.ops.topk import NEG_INF, masked_topk

            if self._mesh is not None:
                from recbole_gnn_tpu.parallel.topk import (
                    distributed_full_sort_topk)

                def fn(uids, hist, item_table, user_table):
                    ue = user_table[uids]
                    # appended 0 column guarantees the PAD item is
                    # always excluded even when a history row is full
                    hist = jnp.concatenate(
                        [hist, jnp.zeros((hist.shape[0], 1), hist.dtype)],
                        axis=1)
                    return distributed_full_sort_topk(
                        ue, item_table, hist, k, self._mesh,
                        axis=self._shard_axis, n_valid_items=self.n_items)
            else:
                def fn(uids, hist, item_table, user_table):
                    ue = user_table[uids]
                    scores = jnp.dot(ue, item_table.T,
                                     preferred_element_type=jnp.float32)
                    rows = jnp.arange(scores.shape[0])[:, None]
                    mask = jnp.zeros(scores.shape, bool
                                     ).at[rows, hist].set(True)
                    scores = jnp.where(mask, NEG_INF, scores)
                    scores = scores.at[:, 0].set(NEG_INF)   # PAD item
                    return masked_topk(scores, k)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _hist_rows(self, uids: np.ndarray, width: int | None = None
                   ) -> np.ndarray:
        lens = self._hist_indptr[uids + 1] - self._hist_indptr[uids]
        width = int(width if width is not None else max(lens.max(), 1))
        out = np.zeros((len(uids), width), dtype=np.int64)   # PAD 0
        for b, u in enumerate(uids):
            s, e = self._hist_indptr[u], self._hist_indptr[u + 1]
            out[b, :e - s] = self._hist_items[s:e]
        return out

    # .. public ..

    def resolve_users(self, users) -> np.ndarray:
        """External tokens (or ints matching tokens) → internal ids."""
        return np.asarray(_resolve_tokens(users, self._token2uid, "user"),
                          dtype=np.int64)

    def recommend(self, users, k: int = 10, mask_history: bool = True,
                  return_tokens: bool = True):
        """Top-``k`` items per user.

        ``users``: external tokens (the production interface).  Returns
        ``(items, scores)`` — items as token lists when
        ``return_tokens`` else internal id arrays.
        """
        uids = self.resolve_users(users)
        n = len(uids)
        if n == 0:
            return _empty_result(k, return_tokens)
        b = self._bucket(n)
        # history width also buckets (pow2) so jit keys stay bounded
        lens = self._hist_indptr[uids + 1] - self._hist_indptr[uids]
        w = 1
        while w < max(int(lens.max()), 1):
            w <<= 1
        hist = (self._hist_rows(uids, w) if mask_history
                else np.zeros((n, 1), dtype=np.int64))
        pu = np.zeros(b, dtype=np.int64)
        pu[:n] = uids
        ph = np.zeros((b, hist.shape[1]), dtype=np.int64)
        ph[:n] = hist
        vals, idx = self._scorer(b, k)(
            pu, ph, self.item_table, self.user_table)
        vals = np.asarray(vals)[:n]
        idx = np.asarray(idx)[:n]
        if return_tokens:
            items = [[str(self.item_tokens[j]) for j in row] for row in idx]
            return items, vals
        return idx, vals


# -- session serving ------------------------------------------------------

class SessionServer:
    """Real-time session-based recommendation from a checkpoint.

    Sequential models score *sessions*, so a static two-table artifact
    cannot capture the encoder; this server rebuilds the model from its
    checkpoint once at startup (config → dataset (vocab + shapes) →
    model object + params) and then serves ad-hoc sessions: item-token
    lists → padded ``(B, L)`` arrays (+ the SR-GNN session-graph arrays
    when the model's dataset class builds them — same construction path
    as training, ``data/session.py``, incl. the C++ fast path) →
    jit-cached ``full_scores`` → PAD-masked exact top-k.  No history
    masking — the reference's sequential full-sort convention
    (``SequentialFullSortEvalLoader``).

    Supported: every registered sequential model — SessionGraphDataset
    (SRGNN, GCSAN, TAGNN, NISER, SGNNHN), plain SequentialDataset
    (GRU4Rec, NARM, SASRec), LESSRDataset (EOP multigraph + mailbox +
    shortcut graph) and GCEGNNDataset (reversed sessions + typed
    edges), each built by the same construction path training uses.
    """

    BATCH_BUCKETS = (1, 8, 64, 256)

    def __init__(self, config, checkpoint_path: str | None = None):
        from recbole_gnn_tpu.models import get_model, model_info
        from recbole_gnn_tpu.quick_start import (apply_backend_config,
                                                 create_dataset,
                                                 data_preparation)
        from recbole_gnn_tpu.train.checkpoint import load_checkpoint
        from recbole_gnn_tpu.utils.enums import ModelType

        apply_backend_config(config)
        if config["MODEL_TYPE"] != ModelType.SEQUENTIAL:
            raise ValueError("SessionServer serves sequential models; "
                             "use RecServer + export_artifact for "
                             "general/social models")
        info = model_info(config["model"])
        if info.dataset_class not in ("SequentialDataset",
                                      "SessionGraphDataset",
                                      "LESSRDataset", "GCEGNNDataset"):
            raise ValueError(
                f"{info.name} builds specialized per-session structures "
                f"({info.dataset_class}); serve it via the offline "
                "evaluator")
        self._dataset_class = info.dataset_class
        ds = create_dataset(config)
        # data_preparation (not a bare ds.build()) for the tier-3 split
        # cache: restarts skip augmentation + graph construction; the
        # discarded sequential eval loaders are O(1) wrappers
        (_, train_ds), _, _ = data_preparation(config, ds)
        self.model = get_model(config["model"])(config, train_ds)
        ckpt = checkpoint_path or os.path.join(
            config["checkpoint_dir"] or "saved/",
            f"{config['model']}-{config['dataset']}.ckpt")
        state = load_checkpoint(ckpt)
        self.params = state["params"]
        self.extras = state.get("extras", {})
        self.consts = self.model.consts
        if hasattr(self.model, "serving_calibrate"):
            # freeze population statistics (e.g. LESSR's BatchNorm)
            # from a spread sample of training sessions so serving
            # scores are batch-size invariant
            m = min(1024, train_ds.inter_num)
            rows = np.linspace(0, train_ds.inter_num - 1, m,
                               dtype=np.int64)
            cb = {"item_seq":
                  train_ds.inter[train_ds.item_list_field][rows],
                  "item_seq_len":
                  train_ds.inter[train_ds.item_length_field][rows]}
            for gk, gv in getattr(train_ds, "session_graphs", {}).items():
                cb[gk] = gv[rows]
            self.extras = self.model.serving_calibrate(
                self.params, self.consts, self.extras, cb)
        self.item_tokens = train_ds.field2id_token[train_ds.iid_field]
        self._tok2iid = {str(t): i for i, t in enumerate(self.item_tokens)}
        self.max_seq_len = int(train_ds.max_seq_len)
        self.n_items = int(train_ds.n_items)
        self.meta = {"model": str(config["model"]),
                     "dataset": str(config["dataset"]),
                     "checkpoint": ckpt}
        self._jit_cache = {}

    def _bucket(self, n: int) -> int:
        return _pad_to_bucket(n, self.BATCH_BUCKETS)

    def _scorer(self, batch: int, k: int):
        key = (batch, k)
        if key not in self._jit_cache:
            import jax

            from recbole_gnn_tpu.ops.topk import NEG_INF, masked_topk

            def fn(params, consts, extras, b):
                scores = self.model.full_scores(
                    params, consts, extras, b, jax.random.PRNGKey(0),
                    False)
                scores = scores.at[:, 0].set(NEG_INF)   # PAD item
                return masked_topk(scores, k)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def recommend(self, sessions, k: int = 10, return_tokens: bool = True):
        """Top-``k`` next items per session.

        ``sessions``: list of item-token lists (each the user's current
        session, oldest first; only the last ``max_seq_len`` items are
        used, matching the training-time window).
        """
        n = len(sessions)
        if n == 0:
            return _empty_result(k, return_tokens)
        L = self.max_seq_len
        seqs = np.zeros((n, L), dtype=np.int32)
        lens = np.zeros(n, dtype=np.int32)
        for r, s in enumerate(sessions):
            ids = _resolve_tokens(s, self._tok2iid, "item")
            if not ids:
                raise KeyError("empty session")
            ids = ids[-L:]
            seqs[r, :len(ids)] = ids
            lens[r] = len(ids)
        b = self._bucket(n)
        if b > n:
            seqs = np.concatenate(
                [seqs, np.repeat(seqs[:1], b - n, axis=0)])
            lens = np.concatenate(
                [lens, np.repeat(lens[:1], b - n, axis=0)])
        batch = {"item_seq": seqs, "item_seq_len": lens}
        if self._dataset_class == "SessionGraphDataset":
            from recbole_gnn_tpu.data.session import (
                SessionGraphDataset, _alias_per_row, _unique_per_row)
            from recbole_gnn_tpu.native import build_session_graphs_native
            native = build_session_graphs_native(seqs, lens)
            if native is not None:
                x, n_nodes, alias, src, dst, n_edges = native
            else:
                x, n_nodes = _unique_per_row(seqs)
                alias = _alias_per_row(x, n_nodes, seqs, lens)
                src, dst, n_edges = SessionGraphDataset._consecutive_edges(
                    alias, lens, L)
            batch.update(x=x, n_nodes=n_nodes, alias_inputs=alias,
                         edge_src=src, edge_dst=dst, n_edges=n_edges)
        elif self._dataset_class == "LESSRDataset":
            from recbole_gnn_tpu.data.session import build_lessr_graphs
            graphs, _ = build_lessr_graphs(seqs, lens, L)
            # eop_mail width K is data-dependent (max in-degree of THIS
            # request); pad it to the next pow2 so the jit cache stays
            # bounded (~log2(L) entries per batch bucket) instead of
            # recompiling the forward for every new K
            mail = graphs["eop_mail"]
            kp = 1
            while kp < mail.shape[2]:
                kp <<= 1
            if kp > mail.shape[2]:
                graphs["eop_mail"] = np.pad(
                    mail, ((0, 0), (0, 0), (0, kp - mail.shape[2])))
            batch.update(graphs)
        elif self._dataset_class == "GCEGNNDataset":
            from recbole_gnn_tpu.data.session import (build_gcegnn_graphs,
                                                      reverse_sessions)
            seqs = reverse_sessions(seqs, lens)
            batch["item_seq"] = seqs   # training-time sessions are
            graphs, _ = build_gcegnn_graphs(seqs, lens, L)  # reversed
            batch.update(graphs)
        vals, idx = self._scorer(b, k)(
            self.params, self.consts, self.extras, batch)
        vals = np.asarray(vals)[:n]
        idx = np.asarray(idx)[:n]
        if return_tokens:
            items = [[str(self.item_tokens[j]) for j in row] for row in idx]
            return items, vals
        return idx, vals


# -- minimal stdlib HTTP endpoint ----------------------------------------

def make_http_server(server, host: str = "127.0.0.1", port: int = 8080):
    """ThreadingHTTPServer wrapping ``server.recommend``.

    RecServer:     POST /recommend {"users": [...], "k": 10,
                                    "mask_history": true}
    SessionServer: POST /recommend {"sessions": [[tok, ...], ...],
                                    "k": 10}
      → {..., "items": [[...]], "scores": [[...]]}
    GET /healthz → {"status": "ok", "model": ..., "n_items": ...}
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    is_session = isinstance(server, SessionServer)
    req_key = "sessions" if is_session else "users"

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "model": server.meta["model"],
                                 "dataset": server.meta["dataset"],
                                 "n_users": getattr(server, "n_users", None),
                                 "n_items": server.n_items})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/recommend":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if is_session:
                    items, scores = server.recommend(
                        req[req_key], k=int(req.get("k", 10)))
                else:
                    items, scores = server.recommend(
                        req[req_key], k=int(req.get("k", 10)),
                        mask_history=bool(req.get("mask_history", True)))
                echo = (req[req_key] if is_session
                        else [str(u) for u in req[req_key]])
                self._send(200, {req_key: echo,
                                 "items": items,
                                 "scores": [[float(v) for v in row]
                                            for row in scores]})
            except KeyError as e:
                self._send(400, {"error": f"unknown user or missing "
                                          f"field: {e}"})
            except Exception as e:   # serving endpoint: never crash
                self._send(500, {"error": str(e)})

        def log_message(self, *a):   # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


# -- CLI ------------------------------------------------------------------

def _build_config(args):
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.config.config import parse_cli
    return Config(model=args.model, dataset=args.dataset,
                  config_file_list=args.config_files,
                  config_dict=parse_cli(args.params or []))


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(prog="recbole_gnn_tpu.serve")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("export", help="export serving artifact")
    ex.add_argument("-m", "--model", required=True)
    ex.add_argument("-d", "--dataset", required=True)
    ex.add_argument("--config_files", nargs="*", default=None)
    ex.add_argument("--checkpoint", default=None)
    ex.add_argument("--out", required=True)
    ex.add_argument("--mask_splits",
                    choices=("all", "train+valid", "train"), default="all")
    ex.add_argument("--compress", action="store_true",
                    help="deflate the artifact (slow at web scale)")

    from recbole_gnn_tpu.config.config import _coerce

    q = sub.add_parser("query", help="one-shot top-k query")
    q.add_argument("--artifact", required=True)
    q.add_argument("--users", nargs="+", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mesh_shape", type=_coerce, default=None)

    h = sub.add_parser("http", help="serve over HTTP")
    h.add_argument("--artifact", required=True)
    h.add_argument("--host", default="127.0.0.1")
    h.add_argument("--port", type=int, default=8080)
    h.add_argument("--mesh_shape", type=_coerce, default=None)

    se = sub.add_parser("session", help="session-based top-k from a "
                                        "checkpoint (sequential models)")
    se.add_argument("-m", "--model", required=True)
    se.add_argument("-d", "--dataset", required=True)
    se.add_argument("--config_files", nargs="*", default=None)
    se.add_argument("--checkpoint", default=None)
    se.add_argument("--session", nargs="+", default=None,
                    help="item tokens, oldest first (one-shot query)")
    se.add_argument("-k", type=int, default=10)
    se.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve over HTTP instead of a one-shot query")
    se.add_argument("--host", default="127.0.0.1")

    args, extra = ap.parse_known_args(argv)
    if args.cmd not in ("export", "session") and extra:
        ap.error(f"unrecognized arguments: {' '.join(extra)}")
    args.params = extra   # export: --key=value config overrides (run.py style)
    if args.cmd == "export":
        out = export_artifact(_build_config(args), args.out,
                              checkpoint_path=args.checkpoint,
                              mask_splits=args.mask_splits,
                              compress=args.compress)
        print(f"wrote {out}")
    elif args.cmd == "query":
        srv = RecServer(args.artifact, mesh_shape=args.mesh_shape)
        items, scores = srv.recommend(args.users, k=args.k)
        for u, row, vs in zip(args.users, items, scores):
            pairs = ", ".join(f"{t}:{v:.3f}" for t, v in zip(row, vs))
            print(f"{u}: {pairs}")
    elif args.cmd == "http":
        srv = RecServer(args.artifact, mesh_shape=args.mesh_shape)
        httpd = make_http_server(srv, args.host, args.port)
        print(f"serving {srv.meta['model']}/{srv.meta['dataset']} on "
              f"http://{args.host}:{args.port}")
        httpd.serve_forever()
    elif args.cmd == "session":
        srv = SessionServer(_build_config(args),
                            checkpoint_path=args.checkpoint)
        if args.http is not None:
            httpd = make_http_server(srv, args.host, args.http)
            print(f"serving sessions for {srv.meta['model']}/"
                  f"{srv.meta['dataset']} on "
                  f"http://{args.host}:{args.http}")
            httpd.serve_forever()
        elif args.session:
            items, scores = srv.recommend([args.session], k=args.k)
            pairs = ", ".join(f"{t}:{v:.3f}"
                              for t, v in zip(items[0], scores[0]))
            print(f"{' '.join(args.session)} -> {pairs}")
        else:
            ap.error("session: pass --session tokens or --http PORT")


if __name__ == "__main__":
    main()
