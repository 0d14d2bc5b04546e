"""Quick calibration: does the planted signal in the synthetic dataset
separate model families the way the reference leaderboards do?

Trains a handful of models for a few epochs on the generated dataset
(CPU by default) and prints test metrics.  Used to pick generator
betas before committing to the full study sweep.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

if os.environ.get("SYNTH_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

from gen_synth import generate  # noqa: E402  (run from scripts/synth_study)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=["BPR", "LightGCN"])
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--data", default="/tmp/rgt_synth")
    ap.add_argument("--seed", type=int, default=2020)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data, "synth", "synth.inter")):
        print(generate(os.path.join(args.data, "synth")))

    from recbole_gnn_tpu.quick_start import objective_function
    for m in args.models:
        cfg = {
            "model": m,
            "dataset": "synth",
            "data_path": args.data,
            "epochs": args.epochs,
            "seed": args.seed,
            "state": "ERROR",
            "train_batch_size": 2048,
            "eval_batch_size": 512,
            "checkpoint_dir": "/tmp/rgt_synth_saved",
            "MAX_ITEM_LIST_LENGTH": 20,
            "stopping_step": 10,
        }
        if m == "NCL":
            cfg["num_clusters"] = 100   # 900-user synth < default 1000
        t0 = time.time()
        try:
            res = objective_function(config_dict=cfg, saved=False)
        except Exception as e:
            print(f"{m:10s} FAILED: {e}", flush=True)
            continue
        tr = res["test_result"]
        print(f"{m:10s} ndcg@10={tr['ndcg@10']:.4f} "
              f"recall@10={tr['recall@10']:.4f} mrr@10={tr['mrr@10']:.4f} "
              f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
