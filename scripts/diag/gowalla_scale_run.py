"""Gowalla-scale sparse-path validation (BASELINE.json config #5 shape):
~100k users x 1.3M items, 6M interactions -> forced-sparse LightGCN,
Pallas SpMM, big-catalog full-sort eval.  Run from the repo root.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = "/tmp/synth_data/gowalla_synth"
N_U, N_I, N = 100_000, 1_300_000, 6_000_000


def gen():
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "gowalla_synth.inter")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(3)
    pop = 1.0 / (np.arange(1, N_I + 1) ** 0.75)
    pop /= pop.sum()
    users = np.repeat(np.arange(1, N_U + 1), N // N_U)
    items = rng.choice(N_I, size=len(users), p=pop) + 1
    ts = 1_300_000_000 + rng.integers(0, 10**7, len(users))
    t0 = time.time()
    with open(path, "w") as f:
        f.write("user_id:token\titem_id:token\ttimestamp:float\n")
        np.savetxt(f, np.column_stack([users, items, ts]), fmt="%d",
                   delimiter="\t")
    print(f"wrote {len(users)} rows in {time.time()-t0:.0f}s")


def run():
    # batch size as argv[1]: the per-step cost is dominated by the
    # fixed full-graph propagation (6 SpMMs fwd+bwd), so larger
    # batches cut steps/epoch near-linearly — the TPU-native lever
    # for epoch time at this scale (MXU prefers big batches anyway)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
    t0 = time.time()
    res = run_recbole_gnn_tpu(
        model="LightGCN", dataset="gowalla_synth",
        config_dict={
            "data_path": "/tmp/synth_data", "epochs": 2,
            "n_layers": 3, "train_batch_size": batch,
            "eval_batch_size": 256,           # B x 1.3M score rows
            "eval_step": 2, "enable_sparse": True,
            # chunked-scan dispatch: 64 steps per device dispatch —
            # per-step tunnel latency dominated the epoch otherwise,
            # and the whole-epoch scan compiles too slowly remotely
            # eval_scan chunked: the whole-pass (392-batch) scanned
            # eval program crashes the TPU worker at this scale;
            # 32-batch chunks keep one compile + 13 dispatches
            "epoch_scan": 64, "eval_scan": 32,
            "load_col": {"inter": ["user_id", "item_id", "timestamp"]},
            "checkpoint_dir": "/tmp/rgt_gowalla", "state": "INFO"},
        verbose=True)
    print("total wall:", time.time() - t0)
    print(res["test_result"])
    try:
        import jax
        ms = jax.local_devices()[0].memory_stats() or {}
        peak = ms.get("peak_bytes_in_use")
        if peak:
            print(f"peak HBM: {peak / 2**30:.2f} GiB "
                  f"(limit {ms.get('bytes_limit', 0) / 2**30:.2f} GiB)")
    except Exception as e:  # axon may not expose memory_stats
        print("memory_stats unavailable:", e)


if __name__ == "__main__":
    gen()
    run()
