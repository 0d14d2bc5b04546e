"""Quality-parity study on the structured synthetic dataset.

Purpose (VERDICT r3 "What's missing" #1, final form): the reference's
quality gate is its tuned ml-1m / diginetica / lastfm leaderboards,
which cannot be fetched here (no egress).  The fixture twin-runs
(results/fixture_twin.md) verified end-to-end parity but on 6k RANDOM
interactions, where half the model zoo sits at the noise floor.  This
study runs the same twin protocol on a dataset with PLANTED
collaborative/sequential/social structure (scripts/synth_study/
gen_synth.py) at ml-100k scale, so that:

1. every family trains in its intended regime (graph smoothing,
   contrastive regularization, Markov transitions, social homophily
   all carry signal), and
2. the resulting MODEL ORDERING can be compared against the
   reference's published leaderboard ordering (SURVEY.md §6), and
3. the torch twins (scripts/twin/torch_models.py — reference training
   semantics on this framework's loaders) bound implementation error
   at a scale where metrics are far from the noise floor.

Outputs: results/synth_quality.{md,json}.

Usage:
  python scripts/synth_study/run_study.py [--families general sequential social twins]
      [--epochs-general 50] [--epochs-seq 30] [--data /tmp/rgt_synth]
  SYNTH_TPU=1 ... runs the framework side on the attached TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np  # noqa: E402

import jax  # noqa: E402

if os.environ.get("SYNTH_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, HERE)
from gen_synth import generate  # noqa: E402

SEED = 2020

GENERAL = ["BPR", "NeuMF", "LightGCN", "NGCF", "SGL", "SimGCL", "XSimGCL",
           "NCL", "HMLET", "DirectAU", "LightGCL", "SSL4REC"]
SEQUENTIAL = ["GRU4Rec", "NARM", "SASRec", "SRGNN", "GCSAN", "NISER",
              "TAGNN", "GCEGNN", "SGNNHN", "LESSR"]
SOCIAL = ["DiffNet", "MHCN", "SEPT"]
TWINS = ["LightGCN", "NGCF", "SGL", "SimGCL", "XSimGCL", "SSL4REC",
         "SRGNN", "GCEGNN"]

# The reference's PUBLISHED best hyper-parameters — the leaderboard
# reproduction recipes (reference results/general/ml-1m.md:62-75,
# results/sequential/diginetica.md:68-81, results/social/lastfm.md:64-74).
# BASELINE.md is explicit that the leaderboard numbers come from these,
# not the yaml defaults, so the ordering study uses them too (key names
# are identical in this framework's config).
BEST_PARAMS = {
    "BPR": {"learning_rate": 0.001},
    "NeuMF": {"learning_rate": 0.0001, "mlp_hidden_size": [32, 16, 8],
              "dropout_prob": 0},
    "NGCF": {"learning_rate": 0.0002, "message_dropout": 0.0,
             "node_dropout": 0.0},
    "LightGCN": {"learning_rate": 0.002, "n_layers": 3,
                 "reg_weight": 1e-4},
    "LightGCL": {"learning_rate": 0.001, "n_layers": 2, "lambda1": 1e-4,
                 "temp": 2, "lambda2": 1e-7, "dropout": 0.1},
    "SGL": {"learning_rate": 0.002, "n_layers": 3, "reg_weight": 1e-4,
            "ssl_tau": 0.5, "drop_ratio": 0.1, "ssl_weight": 0.005},
    "HMLET": {"learning_rate": 0.002, "n_layers": 4,
              "activation_function": "leakyrelu"},
    "NCL": {"learning_rate": 0.002, "n_layers": 3, "reg_weight": 1e-4,
            "ssl_temp": 0.1, "ssl_reg": 1e-6, "hyper_layers": 1,
            "alpha": 1.5},
    "SimGCL": {"learning_rate": 0.002, "n_layers": 2, "reg_weight": 1e-4,
               "temperature": 0.05, "lambda": 1e-5, "eps": 0.1},
    "XSimGCL": {"learning_rate": 0.002, "n_layers": 2, "reg_weight": 1e-4,
                "temperature": 0.2, "lambda": 0.1, "eps": 0.2,
                "layer_cl": 1},
    # sequential (diginetica recipes)
    "GRU4Rec": {"learning_rate": 0.01, "hidden_size": 128,
                "dropout_prob": 0.3, "num_layers": 1},
    "SASRec": {"learning_rate": 0.001, "n_layers": 2,
               "attn_dropout_prob": 0.2, "hidden_dropout_prob": 0.2},
    "NARM": {"learning_rate": 0.001, "hidden_size": 128, "n_layers": 1,
             "dropout_probs": [0.25, 0.5]},
    "SRGNN": {"learning_rate": 0.001, "step": 1},
    "GCSAN": {"learning_rate": 0.001, "step": 1},
    "NISER": {"learning_rate": 0.001, "sigma": 16},
    "LESSR": {"learning_rate": 0.001, "n_layers": 4},
    "TAGNN": {"learning_rate": 0.001},
    "GCEGNN": {"learning_rate": 0.001, "dropout_global": 0.5},
    "SGNNHN": {"learning_rate": 0.003, "scale": 12, "step": 2},
    # social (lastfm recipes)
    "DiffNet": {"learning_rate": 0.0005, "n_layers": 1},
    "MHCN": {"learning_rate": 0.0005, "n_layers": 2, "ssl_reg": 1e-5},
    "SEPT": {"learning_rate": 0.0005, "n_layers": 2, "ssl_weight": 1e-7},
}

# reference leaderboard NDCG@10 (SURVEY.md §6) for rank comparison
REF_NDCG = {
    "general": {  # results/general/ml-1m.md:51-60
        "BPR": 0.2401, "NeuMF": 0.2271, "NGCF": 0.2508, "LightGCN": 0.2538,
        "LightGCL": 0.2479, "SGL": 0.2505, "HMLET": 0.2490, "NCL": 0.2702,
        "SimGCL": 0.2667, "XSimGCL": 0.2750,
    },
    "sequential": {  # results/sequential/diginetica.md:57-66
        "GRU4Rec": 0.2114, "NARM": 0.2188, "SASRec": 0.2393, "SRGNN": 0.2253,
        "GCSAN": 0.2408, "NISER": 0.2430, "LESSR": 0.2279, "TAGNN": 0.2263,
        "GCEGNN": 0.2507, "SGNNHN": 0.2418,
    },
    "social": {  # results/social/lastfm.md:58-62
        "NGCF": 0.1898, "LightGCN": 0.1972, "DiffNet": 0.1694,
        "MHCN": 0.2068, "SEPT": 0.2057,
    },
}


def _cfg(model, data, epochs, **over):
    # sequential models study the session-style dataset (short Markov
    # sessions — the diginetica regime); everything else the
    # user-history one
    ds_name = "synthseq" if model in SEQUENTIAL else "synth"
    cfg = {
        "model": model,
        "dataset": ds_name,
        "data_path": data,
        "epochs": epochs,
        "seed": SEED,
        "state": "ERROR",
        "train_batch_size": 2048,
        "eval_batch_size": 512,
        "checkpoint_dir": "/tmp/rgt_synth_saved",
        "MAX_ITEM_LIST_LENGTH": 20,
        "stopping_step": 10,
    }
    if model == "NCL":
        cfg["num_clusters"] = 100   # 900-user synth < default 1000
    cfg.update(BEST_PARAMS.get(model, {}))
    cfg.update(over)
    return cfg


def run_framework(model, data, epochs):
    from recbole_gnn_tpu.quick_start import objective_function
    t0 = time.time()
    res = objective_function(config_dict=_cfg(model, data, epochs),
                             saved=False)
    out = {k: round(float(v), 4) for k, v in res["test_result"].items()}
    out["_seconds"] = round(time.time() - t0, 1)
    out["_best_valid"] = round(float(res["best_valid_score"]), 4)
    return out


def run_twin(model, data, epochs):
    from twin.run_twin import train_twin
    extra = _cfg(model, data, epochs)
    for k in ("model", "epochs", "seed", "state"):
        extra.pop(k, None)   # passed explicitly by train_twin
    t0 = time.time()
    curve = train_twin(model, epochs, extra_cfg=extra,
                       eval_every=max(1, epochs // 5))
    out = dict(curve[-1])
    out["_seconds"] = round(time.time() - t0, 1)
    return out


def spearman(order_a: list[str], ref: dict[str, float]) -> float | None:
    """Spearman rank corr between our NDCG ordering and the reference
    leaderboard's, over the overlapping model set."""
    common = [m for m in order_a if m in ref]
    if len(common) < 3:
        return None
    ours_rank = {m: i for i, m in enumerate(common)}
    ref_rank = {m: i for i, m in enumerate(
        sorted(common, key=lambda m: -ref[m]))}
    n = len(common)
    d2 = sum((ours_rank[m] - ref_rank[m]) ** 2 for m in common)
    return 1 - 6 * d2 / (n * (n * n - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*",
                    default=["general", "sequential", "social", "twins"])
    ap.add_argument("--models", nargs="*", default=None,
                    help="restrict to these models (iteration aid)")
    ap.add_argument("--epochs-general", type=int, default=100)
    ap.add_argument("--epochs-seq", type=int, default=30)
    ap.add_argument("--data", default="/tmp/rgt_synth")
    ap.add_argument("--out", default="results/synth_quality")
    ap.add_argument("--resume", default=None,
                    help="existing .json to merge (skip finished runs)")
    args = ap.parse_args()

    synth_dir = os.path.join(args.data, "synth")
    if not os.path.exists(os.path.join(synth_dir, "synth.inter")):
        print(generate(synth_dir), flush=True)
    seq_dir = os.path.join(args.data, "synthseq")
    if not os.path.exists(os.path.join(seq_dir, "synthseq.inter")):
        from gen_synth import generate_sessions
        print(generate_sessions(seq_dir), flush=True)

    state = {"framework": {}, "twin": {}, "meta": {
        "seed": SEED, "epochs_general": args.epochs_general,
        "epochs_seq": args.epochs_seq}}
    if args.resume and os.path.exists(args.resume):
        with open(args.resume) as f:
            old = json.load(f)
        state["framework"].update(old.get("framework", {}))
        state["twin"].update(old.get("twin", {}))

    def save():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out + ".json", "w") as f:
            json.dump(state, f, indent=1)

    fam_models = {"general": GENERAL, "sequential": SEQUENTIAL,
                  "social": SOCIAL}
    for fam in args.families:
        if fam == "twins":
            continue
        eps = args.epochs_seq if fam == "sequential" else args.epochs_general
        for m in fam_models[fam]:
            if m in state["framework"] or (args.models and
                                           m not in args.models):
                continue
            try:
                r = run_framework(m, args.data, eps)
            except Exception as e:
                r = {"_error": repr(e)[:300]}
            state["framework"][m] = r
            nd = r.get("ndcg@10", float("nan"))
            print(f"[fw ] {m:10s} ndcg@10={nd} [{r.get('_seconds', '?')}s]",
                  flush=True)
            save()

    if "twins" in args.families:
        for m in TWINS:
            if m in state["twin"] or (args.models and
                                      m not in args.models):
                continue
            eps = (args.epochs_seq if m in ("SRGNN", "GCEGNN")
                   else args.epochs_general)
            try:
                r = run_twin(m, args.data, eps)
            except Exception as e:
                r = {"_error": repr(e)[:300]}
            state["twin"][m] = r
            print(f"[twin] {m:10s} ndcg@10={r.get('ndcg@10')} "
                  f"[{r.get('_seconds', '?')}s]", flush=True)
            save()

    # -- report -----------------------------------------------------
    lines = [
        "# Synthetic-structure quality study",
        "",
        "Dataset: scripts/synth_study/gen_synth.py — 900 users x 1600",
        "items x ~108k interactions with planted low-rank CF structure,",
        "first-order Markov session structure, social homophily and zipf",
        "popularity (seed 424242).  Protocol: identical splits/loaders/",
        "metrics for every run; framework seed 2020; early stopping",
        f"(step 10); {args.epochs_general} epochs general/social, "
        f"{args.epochs_seq} sequential.",
        "",
        "This is the achievable stand-in for the reference's real-data",
        "leaderboards (no dataset egress in this environment): it checks",
        "(a) every family learns real signal far from the noise floor,",
        "(b) model ORDERING against the reference leaderboards, and",
        "(c) torch twin-runs (reference training semantics, this",
        "framework's loaders) agree with our implementations at scale.",
        "",
    ]
    for fam, models in fam_models.items():
        rows = [(m, state["framework"].get(m, {})) for m in models]
        rows = [(m, r) for m, r in rows if "ndcg@10" in r]
        rows.sort(key=lambda mr: -mr[1]["ndcg@10"])
        lines += [f"## {fam}", "",
                  "| Model | NDCG@10 | Recall@10 | MRR@10 | Hit@10 | ref ml-1m/diginetica/lastfm NDCG@10 |",
                  "|---|---|---|---|---|---|"]
        for m, r in rows:
            ref = REF_NDCG[fam].get(m)
            lines.append(
                f"| {m} | {r['ndcg@10']:.4f} | {r['recall@10']:.4f} "
                f"| {r['mrr@10']:.4f} | {r.get('hit@10', float('nan')):.4f} "
                f"| {ref if ref is not None else '—'} |")
        rho = spearman([m for m, _ in rows], REF_NDCG[fam])
        if rho is not None:
            lines += ["", f"Spearman rank corr vs reference leaderboard "
                          f"(overlap): **{rho:.2f}**"]
        lines.append("")

    if state["twin"]:
        lines += ["## Twin agreement (torch reference semantics, same loaders)",
                  "",
                  "| Model | twin NDCG@10 | ours NDCG@10 | twin Recall@10 | ours Recall@10 |",
                  "|---|---|---|---|---|"]
        for m in TWINS:
            tw, fw = state["twin"].get(m, {}), state["framework"].get(m, {})
            if "ndcg@10" not in tw or "ndcg@10" not in fw:
                continue
            lines.append(f"| {m} | {tw['ndcg@10']:.4f} | {fw['ndcg@10']:.4f} "
                         f"| {tw['recall@10']:.4f} | {fw['recall@10']:.4f} |")
        lines.append("")

    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    save()
    print(f"wrote {args.out}.md/.json")


if __name__ == "__main__":
    main()
