"""Cold-user north-star: where graph propagation earns its keep.

The uniform-density north-star run (r5_northstar_converge.py,
results/northstar.md) showed MF matching LightGCN at 60
interactions/user — MF's textbook regime.  This variant plants the
OPPOSITE regime for half the users: 50k COLD users with 6
interactions each (≈4-5 train points — too few to estimate an MF
embedding) alongside 50k warm users carrying the rest of the 6M
budget.  Hypothesis (the published LightGCN/NGCF motivation): graph
propagation pools a cold user's item neighborhoods — shared with warm
same-cluster users — and should beat MF on the cold segment while
matching it on the warm one.

Stages:
  gen        northstar_cold dataset (cold_frac=0.5, cold_n=6)
  lightgcn   LightGCN 3-layer, ELL path, B=65536 (same recipe as the
             uniform run)
  bpr        BPR, same recipe
  export     artifacts for both, mask_splits=train+valid (the
             test-evaluator convention)
  segeval    per-segment (cold / warm) test metrics computed from the
             artifacts through RecServer — serving doubles as the
             offline segment-analysis path

Usage: python scripts/diag/r5_northstar_cold.py [stage ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

DATA_DIR = "/tmp/synth_data"
NAME = "northstar_cold"
CKPT_DIR = "/tmp/rgt_northstar_cold"
OUT_JSON = os.path.join(CKPT_DIR, "summary.json")
N_COLD = 50_000

BASE_CFG = {
    "data_path": DATA_DIR,
    "load_col": {"inter": ["user_id", "item_id", "timestamp"]},
    "checkpoint_dir": CKPT_DIR,
    "metrics": ["Recall", "MRR", "NDCG", "Hit", "Precision"],
    "topk": [10, 20],
    "valid_metric": "NDCG@10",
    "train_batch_size": 65536,
    "eval_batch_size": 256,
    "learning_rate": 5e-3,
    "epochs": 64,
    "eval_step": 4,
    "stopping_step": 3,
    "stopping_min_epochs": 24,
    "epoch_scan": 64,
    "eval_scan": 32,
    "state": "INFO",
}


def _summary_update(key, value):
    os.makedirs(CKPT_DIR, exist_ok=True)
    blob = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            blob = json.load(f)
    blob[key] = value
    with open(OUT_JSON, "w") as f:
        json.dump(blob, f, indent=1, default=float)
    print(f"[summary] {key}: {json.dumps(value, default=float)[:300]}",
          flush=True)


def stage_gen():
    from synth_study.gen_northstar import generate
    t0 = time.time()
    stats = generate(os.path.join(DATA_DIR, NAME), name=NAME,
                     cold_frac=0.5, cold_n=6)
    stats["gen_s"] = round(time.time() - t0, 1)
    _summary_update("gen", stats)


def _train(model):
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
    cfg = dict(BASE_CFG)
    if model == "LightGCN":
        cfg.update({"enable_sparse": True, "n_layers": 3})
    t0 = time.time()
    res = run_recbole_gnn_tpu(model=model, dataset=NAME, config_dict=cfg,
                              verbose=True)
    _summary_update(model.lower(), {
        "best_valid": {k: float(v) for k, v in
                       (res["best_valid_result"] or {}).items()},
        "test": {k: float(v) for k, v in res["test_result"].items()},
        "wall_s": round(time.time() - t0, 1),
    })


def _art_path(model):
    return os.path.join(CKPT_DIR, f"{NAME}_{model.lower()}_tv.npz")


def stage_export():
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.serve import export_artifact
    for model in ("LightGCN", "BPR"):
        cfg = dict(BASE_CFG)
        if model == "LightGCN":
            cfg.update({"enable_sparse": True, "n_layers": 3})
        t0 = time.time()
        export_artifact(Config(model=model, dataset=NAME, config_dict=cfg),
                        _art_path(model), mask_splits="train+valid")
        print(f"exported {model} in {time.time() - t0:.0f}s", flush=True)


def _test_split_arrays():
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    cfg = Config(model="BPR", dataset=NAME, config_dict=dict(BASE_CFG))
    ds = create_dataset(cfg)
    _, _, (_, test_ds) = data_preparation(cfg, ds)
    return test_ds.user_item_arrays()


def stage_segeval():
    """Per-segment test metrics from the train+valid-masked artifacts:
    the exact evaluator conventions (PAD excluded, raw-count pos_len)
    replayed through the serving path, split cold vs warm."""
    from recbole_gnn_tpu.serve import RecServer

    te_u, te_i = _test_split_arrays()
    order = np.argsort(te_u, kind="stable")
    te_u, te_i = te_u[order], te_i[order]
    eval_users = np.unique(te_u)
    indptr = np.searchsorted(te_u, np.arange(te_u.max() + 2))

    K = 10
    disc = 1.0 / np.log2(np.arange(1, K + 1) + 1.0)
    cum = np.cumsum(disc)

    for model in ("LightGCN", "BPR"):
        srv = RecServer(_art_path(model))
        seg = {"cold": {m: 0.0 for m in
                        ("recall", "ndcg", "mrr", "hit")} | {"n": 0},
               "warm": {m: 0.0 for m in
                        ("recall", "ndcg", "mrr", "hit")} | {"n": 0}}
        t0 = time.time()
        B = 1024
        for lo in range(0, len(eval_users), B):
            uids = eval_users[lo:lo + B]
            toks = [str(srv.user_tokens[u]) for u in uids]
            idx, _ = srv.recommend(toks, k=K, return_tokens=False)
            for row, u in enumerate(uids):
                pos_raw = te_i[indptr[u]:indptr[u + 1]]
                pos = set(pos_raw.tolist())
                rel = np.array([1.0 if it in pos else 0.0
                                for it in idx[row]])
                hits = rel.sum()
                plen = len(pos_raw)
                s = seg["cold" if int(srv.user_tokens[u]) <= N_COLD
                        else "warm"]
                s["n"] += 1
                s["recall"] += hits / plen
                s["hit"] += 1.0 if hits > 0 else 0.0
                s["mrr"] += (1.0 / (int(np.argmax(rel)) + 1)
                             if rel.max() > 0 else 0.0)
                s["ndcg"] += float((rel * disc).sum()) / cum[
                    min(plen, K) - 1]
        out = {}
        for name, s in seg.items():
            n = max(s["n"], 1)
            out[name] = {f"{m}@10": round(s[m] / n, 5)
                         for m in ("recall", "ndcg", "mrr", "hit")}
            out[name]["users"] = int(s["n"])
        out["wall_s"] = round(time.time() - t0, 1)
        _summary_update(f"segments_{model.lower()}", out)


STAGES = {"gen": stage_gen,
          "lightgcn": lambda: _train("LightGCN"),
          "bpr": lambda: _train("BPR"),
          "export": stage_export,
          "segeval": stage_segeval}

if __name__ == "__main__":
    picks = sys.argv[1:] or ["gen", "lightgcn", "bpr", "export", "segeval"]
    for s in picks:
        print(f"=== stage {s} ===", flush=True)
        STAGES[s]()
