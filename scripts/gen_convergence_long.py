"""Long-horizon convergence baselines for the CONTRASTIVE family.

VERDICT r2 #5: at 3 epochs the contrastive models' fixture metrics sit
near the absolute tolerance floor (SimGCL recall ≈ 0.013), so the
3-epoch gate admits a ~2x quality regression in exactly the family
with the subtlest losses (InfoNCE variants).  This records a 15-epoch
seeded baseline for SimGCL/XSimGCL/NCL/SGL (+ LightGCN as the
non-contrastive anchor) where the signal is far above the band;
tests/test_convergence_baselines.py::test_contrastive_long_horizon
re-runs SimGCL and XSimGCL against it in CI.

Usage: python scripts/gen_convergence_long.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

EPOCHS = 15
SEED = 2020

MODELS = ["LightGCN", "SGL", "SimGCL", "XSimGCL", "NCL"]
OVERRIDES = {"NCL": {"num_clusters": 8, "warm_up_step": 0, "m_step": 1}}


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from conftest import base_config_dict
    from recbole_gnn_tpu.quick_start import objective_function

    out = {"epochs": EPOCHS, "seed": SEED,
           "fixture": "tests/test_data/test", "models": {}}
    for m in MODELS:
        cfg = base_config_dict(model=m, epochs=EPOCHS, seed=SEED,
                               **OVERRIDES.get(m, {}))
        t0 = time.time()
        res = objective_function(config_dict=cfg, saved=False)
        dt = time.time() - t0
        out["models"][m] = {
            "test_result": {k: round(float(v), 6)
                            for k, v in res["test_result"].items()},
            "seconds": round(dt, 1),
        }
        print(f"{m:10s} {dt:6.1f}s  "
              f"recall@10={res['test_result'].get('recall@10', 0):.4f} "
              f"ndcg@10={res['test_result'].get('ndcg@10', 0):.4f}",
              flush=True)

    with open("results/fixture_convergence_long.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote results/fixture_convergence_long.json")


if __name__ == "__main__":
    main()
