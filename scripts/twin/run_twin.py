"""Fixture twin-runs: torch replication of reference training semantics
vs this framework, on IDENTICAL splits/batches/metrics (VERDICT r3 #2).

Protocol: for each model, the torch twin (scripts/twin/torch_models.py)
consumes THIS framework's config + dataset + loaders — so splits, batch
composition, negative samples and metric code are byte-identical — and
only the training semantics (reference model forward + loss + init
family + torch Adam) differ.  Both sides train EPOCHS epochs; the twin
is evaluated on the test split each epoch; the framework's final test
metrics come from objective_function on the same config.

If the twin reproduces an "anomalous" fixture number (e.g. NGCF ≪
LightGCN), the anomaly is a property of reference semantics on this
fixture, not a bug here.  If the twin strongly disagrees, there is a
bug to root-cause.

Usage:
  python scripts/twin/run_twin.py [LightGCN NGCF SGL SimGCL SRGNN] \
      [--epochs 15] [--out results/fixture_twin]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "scripts")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from twin.torch_models import (  # noqa: E402
    TwinGCEGNN, TwinLightGCN, TwinNGCF, TwinSGL, TwinSimGCL, TwinSRGNN,
    TwinSSL4Rec, TwinXSimGCL, sym_norm_adj)

SEED = 2020


def _framework_pipeline(model_name, epochs, extra_cfg=None):
    from conftest import base_config_dict
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import (
        create_dataset, data_preparation)
    cfg_dict = base_config_dict(model=model_name, epochs=epochs, seed=SEED,
                                state="ERROR", **(extra_cfg or {}))
    config = Config(config_dict=cfg_dict)
    ds = create_dataset(config)
    splits = data_preparation(config, ds)
    return config, splits


def _np(batch):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in batch.items()}


def _eval_general(model, loader, ks=(10,)):
    """Full-sort eval matching eval/evaluator.py:_full_sort_sums —
    history + PAD-item masking, topk, framework metric code."""
    from recbole_gnn_tpu.eval.metrics import topk_metrics
    model.eval()
    with torch.no_grad():
        ua, ia = model.propagate()
        sums, wsum = {}, 0.0
        for batch in loader:
            users = torch.from_numpy(batch["user_id"]).long()
            scores = ua[users] @ ia.T
            hist = torch.from_numpy(batch["history_items"]).long()
            scores.scatter_(1, hist, float("-inf"))
            scores[:, 0] = float("-inf")
            _, idx = torch.topk(scores, max(ks), dim=1)
            vals = topk_metrics(np.asarray(idx), batch["pos_items"],
                                batch["pos_len"], ks)
            w = batch["weight"]
            for k, v in vals.items():
                sums[k] = sums.get(k, 0.0) + float(np.sum(np.asarray(v) * w))
            wsum += float(w.sum())
    return {k: v / wsum for k, v in sums.items()}


def _eval_sequential(model, loader, ks=(10,)):
    from recbole_gnn_tpu.eval.metrics import topk_metrics
    model.eval()
    sums, wsum = {}, 0.0
    with torch.no_grad():
        for batch in loader:
            tb = _np(batch)
            scores = model.full_scores(tb)
            scores[:, 0] = float("-inf")
            _, idx = torch.topk(scores, max(ks), dim=1)
            vals = topk_metrics(np.asarray(idx), batch["pos_items"],
                                batch["pos_len"], ks)
            w = batch["weight"]
            for k, v in vals.items():
                sums[k] = sums.get(k, 0.0) + float(np.sum(np.asarray(v) * w))
            wsum += float(w.sum())
    return {k: v / wsum for k, v in sums.items()}


def train_twin(model_name, epochs, extra_cfg=None, eval_every=1):
    torch.manual_seed(SEED)
    np.random.seed(SEED)
    config, splits = _framework_pipeline(model_name, epochs, extra_cfg)
    (train_loader, train_ds), _, (test_loader, _) = splits
    lr = float(config["learning_rate"] or 1e-3)
    is_seq = model_name in ("SRGNN", "GCEGNN")

    if model_name == "SRGNN":
        model = TwinSRGNN(train_ds.n_items, config)
    elif model_name == "SSL4REC":
        model = TwinSSL4Rec(train_ds.n_users, train_ds.n_items, config)
    elif model_name == "GCEGNN":
        model = TwinGCEGNN(
            train_ds.n_items, config,
            train_ds.inter[train_ds.item_list_field],
            train_ds.inter[train_ds.iid_field], train_ds.max_seq_len)
    else:
        users, items = train_ds.user_item_arrays()
        adj = sym_norm_adj(users, items, train_ds.n_users, train_ds.n_items)
        if model_name == "LightGCN":
            model = TwinLightGCN(train_ds.n_users, train_ds.n_items, config, adj)
        elif model_name == "NGCF":
            model = TwinNGCF(train_ds.n_users, train_ds.n_items, config, adj)
        elif model_name == "SGL":
            model = TwinSGL(train_ds.n_users, train_ds.n_items, config, adj,
                            users, items)
        elif model_name == "SimGCL":
            model = TwinSimGCL(train_ds.n_users, train_ds.n_items, config, adj)
        elif model_name == "XSimGCL":
            model = TwinXSimGCL(train_ds.n_users, train_ds.n_items, config,
                                adj)
        else:
            raise ValueError(model_name)

    opt = torch.optim.Adam(model.parameters(), lr=lr,
                           weight_decay=float(config["weight_decay"] or 0.0))
    aug_rng = np.random.default_rng(SEED)
    curve = []
    for ep in range(epochs):
        model.train()
        if isinstance(model, TwinSGL):
            model.graph_construction(aug_rng)  # per-epoch views (sgl.py:73-80)
        for batch in train_loader:
            tb = _np(batch)
            w = tb.pop("weight")
            keep = w > 0  # framework pads final batch; drop pad rows
            tb = {k: v[keep] if len(v) == len(keep) else v
                  for k, v in tb.items()}
            opt.zero_grad()
            loss = model.loss(tb)
            loss.backward()
            opt.step()
        if (ep + 1) % eval_every and ep + 1 != epochs:
            continue
        res = (_eval_sequential if is_seq else _eval_general)(
            model, test_loader)
        curve.append({k: round(float(v), 4) for k, v in res.items()})
        print(f"  twin {model_name} ep{ep + 1:02d} "
              f"ndcg@10={res['ndcg@10']:.4f} recall@10={res['recall@10']:.4f}",
              flush=True)
    return curve


def train_framework(model_name, epochs, extra_cfg=None):
    from conftest import base_config_dict
    from recbole_gnn_tpu.quick_start import objective_function
    cfg = base_config_dict(model=model_name, epochs=epochs, seed=SEED,
                           **(extra_cfg or {}))
    res = objective_function(config_dict=cfg, saved=False)
    return {k: round(float(v), 4) for k, v in res["test_result"].items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*",
                    default=["LightGCN", "NGCF", "SGL", "SimGCL", "SRGNN",
                             "GCEGNN"])
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--out", default="results/fixture_twin")
    args = ap.parse_args()

    rows, all_curves = [], {}
    for m in args.models:
        print(f"== {m} ==", flush=True)
        t0 = time.time()
        curve = train_twin(m, args.epochs)
        twin_final = curve[-1]
        ours = train_framework(m, args.epochs)
        dt = time.time() - t0
        rows.append((m, twin_final, ours, dt))
        all_curves[m] = curve
        print(f"{m}: twin ndcg@10={twin_final['ndcg@10']:.4f} "
              f"ours={ours.get('ndcg@10', 0):.4f}  [{dt:.0f}s]", flush=True)

    lines = [
        "# Fixture twin-runs — torch reference-semantics twin vs this framework",
        "",
        f"6k fixture, {args.epochs} epochs, seed {SEED}; identical splits,",
        "batch composition, negative samples and metric code (the twin",
        "consumes this framework's loaders).  Differences isolate model",
        "forward + loss + init + optimizer semantics.  Twin code:",
        "scripts/twin/torch_models.py (reference citations inline).",
        "",
        "| Model | twin NDCG@10 | ours NDCG@10 | twin Recall@10 | ours Recall@10 | twin MRR@10 | ours MRR@10 |",
        "|---|---|---|---|---|---|---|",
    ]
    for m, tw, fw, _ in rows:
        lines.append(
            f"| {m} | {tw['ndcg@10']:.4f} | {fw.get('ndcg@10', 0):.4f} "
            f"| {tw['recall@10']:.4f} | {fw.get('recall@10', 0):.4f} "
            f"| {tw['mrr@10']:.4f} | {fw.get('mrr@10', 0):.4f} |")
    lines += ["", "Per-epoch twin curves: results/fixture_twin.json"]
    os.makedirs("results", exist_ok=True)
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(args.out + ".json", "w") as f:
        json.dump({"curves": all_curves,
                   "final": {m: {"twin": tw, "ours": fw}
                             for m, tw, fw, _ in rows}}, f, indent=1)
    print(f"wrote {args.out}.md/.json")


if __name__ == "__main__":
    main()
