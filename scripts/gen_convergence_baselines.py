"""Record seeded fixture-convergence baselines for all 25 models.

Trains every registered model EPOCHS epochs on the 6k-interaction CPU
fixture with a fixed seed and writes the resulting test metrics to
results/fixture_convergence.json (+ a markdown table).  Between rounds
this makes quality regressions detectable despite no dataset egress
(VERDICT r1 #7); tests/test_convergence_baselines.py re-runs a
representative subset against these numbers.

Usage: python scripts/gen_convergence_baselines.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

EPOCHS = 3
SEED = 2020

MODELS = {
    "general": ["BPR", "NeuMF", "LightGCN", "NGCF", "SGL", "SimGCL",
                "XSimGCL", "NCL", "HMLET", "DirectAU", "LightGCL",
                "SSL4REC"],
    "sequential": ["GRU4Rec", "NARM", "SASRec", "SRGNN", "GCSAN",
                   "NISER", "TAGNN", "GCEGNN", "SGNNHN", "LESSR"],
    "social": ["DiffNet", "MHCN", "SEPT"],
}

OVERRIDES = {
    "NCL": {"num_clusters": 8, "warm_up_step": 0, "m_step": 1},
    "SEPT": {"warm_up_epochs": 1},
}


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from conftest import base_config_dict
    from recbole_gnn_tpu.quick_start import objective_function

    out = {"epochs": EPOCHS, "seed": SEED, "fixture": "tests/test_data/test",
           "models": {}}
    for family, models in MODELS.items():
        for m in models:
            cfg = base_config_dict(model=m, epochs=EPOCHS, seed=SEED,
                                   **OVERRIDES.get(m, {}))
            t0 = time.time()
            res = objective_function(config_dict=cfg, saved=False)
            dt = time.time() - t0
            out["models"][m] = {
                "family": family,
                "test_result": {k: round(float(v), 6)
                                for k, v in res["test_result"].items()},
                "seconds": round(dt, 1),
            }
            print(f"{m:10s} {dt:6.1f}s  "
                  f"recall@10={res['test_result'].get('recall@10', 0):.4f} "
                  f"ndcg@10={res['test_result'].get('ndcg@10', 0):.4f}",
                  flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/fixture_convergence.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    lines = [
        "# Fixture convergence baselines",
        "",
        f"All 25 models, {EPOCHS} epochs, seed {SEED}, CPU, on the 6k",
        "fixture (`tests/test_data/test`).  Regenerate with",
        "`python scripts/gen_convergence_baselines.py`; the regression",
        "test `tests/test_convergence_baselines.py` re-runs a subset",
        "against these numbers.",
        "",
        "| Model | Family | Recall@10 | MRR@10 | NDCG@10 | Hit@10 |",
        "|---|---|---|---|---|---|",
    ]
    for m, rec in sorted(out["models"].items()):
        r = rec["test_result"]
        lines.append(
            f"| {m} | {rec['family']} | {r.get('recall@10', 0):.4f} | "
            f"{r.get('mrr@10', 0):.4f} | {r.get('ndcg@10', 0):.4f} | "
            f"{r.get('hit@10', 0):.4f} |")
    with open("results/fixture_convergence.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote results/fixture_convergence.{json,md}")


if __name__ == "__main__":
    main()
