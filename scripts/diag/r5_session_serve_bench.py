"""Session-serving throughput at diginetica scale (SessionServer).

Companion to r5_serve_bench.py (user-based RecServer at a 1.3M-item
catalog): measures the OTHER serving path — ad-hoc session scoring
through the full per-request pipeline (token mapping → host
session-graph construction → jit-cached full_scores → PAD-masked
exact top-k) for SRGNN on the synthseq dataset (30k Markov sessions ×
2k items, the diginetica regime — scripts/synth_study/gen_synth.py).

Stages: train a short SRGNN checkpoint if none exists, then bench
p50/p95 latency at B=1 and sustained throughput at B=64/256 with
sessions drawn from the real session-length distribution.

Usage: python scripts/diag/r5_session_serve_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

DATA = "/tmp/rgt_synth"
CKPT_DIR = "/tmp/rgt_sserve"

CFG = {
    "data_path": DATA,
    "load_col": {"inter": ["user_id", "item_id", "timestamp"]},
    "checkpoint_dir": CKPT_DIR,
    "epochs": 3,
    "train_batch_size": 2048,
    "eval_batch_size": 512,
    "MAX_ITEM_LIST_LENGTH": 20,
    "state": "ERROR",
}


def main():
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
    from recbole_gnn_tpu.serve import SessionServer

    ckpt = os.path.join(CKPT_DIR, "SRGNN-synthseq.ckpt")
    if not os.path.exists(ckpt):
        t0 = time.time()
        run_recbole_gnn_tpu(model="SRGNN", dataset="synthseq",
                            config_dict=dict(CFG), verbose=False)
        print(f"trained SRGNN checkpoint in {time.time() - t0:.0f}s",
              flush=True)

    t0 = time.time()
    srv = SessionServer(Config(model="SRGNN", dataset="synthseq",
                               config_dict=dict(CFG)))
    print(f"server up in {time.time() - t0:.1f}s "
          f"(n_items={srv.n_items})", flush=True)

    # realistic query sessions: geometric-ish lengths 2..12 over the
    # item vocabulary (tokens), deterministic
    rng = np.random.default_rng(7)
    n_tokens = len(srv.item_tokens)
    def mk_sessions(n):
        out = []
        for _ in range(n):
            ln = int(rng.integers(2, 13))
            ids = rng.integers(1, n_tokens, size=ln)
            out.append([str(srv.item_tokens[i]) for i in ids])
        return out

    results = {}
    for B in (1, 64, 256):
        sess = mk_sessions(B)
        srv.recommend(sess, k=10)              # compile the bucket
        lat = []
        iters = 50 if B == 1 else 20
        for _ in range(iters):
            t0 = time.time()
            srv.recommend(mk_sessions(B), k=10)
            lat.append(time.time() - t0)
        lat = np.array(lat) * 1e3
        results[f"B{B}"] = {
            "p50_ms": round(float(np.percentile(lat, 50)), 1),
            "p95_ms": round(float(np.percentile(lat, 95)), 1),
            "sessions_per_s": round(B / (np.percentile(lat, 50) / 1e3), 1),
        }
        print(f"B={B}: {results[f'B{B}']}", flush=True)
    print(json.dumps({"session_serve": results}))


if __name__ == "__main__":
    main()
