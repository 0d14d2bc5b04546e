"""Serving-path throughput at the north-star catalog scale (round 5).

Builds a gowalla-shaped serving artifact (100k users x 1.3M items,
d=64 — random tables; the query path's cost is shape-, not
value-dependent) and measures RecServer.recommend() end to end:
token resolve -> history mask build -> jitted MXU matmul ->
exact-ApproxTopK -> host top-k tokens.

Usage: python scripts/diag/r5_serve_bench.py [b=1,64,1024] [k=10]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N_USERS, N_ITEMS, D = 100_000, 1_300_000, 64
ART = "/tmp/rgt_serve_bench.npz"


def build_artifact():
    rng = np.random.default_rng(0)
    user_table = rng.normal(size=(N_USERS, D)).astype(np.float32)
    item_table = rng.normal(size=(N_ITEMS, D)).astype(np.float32)
    # zipf-ish histories, mean ~60 items
    lens = np.minimum(512, rng.zipf(1.7, size=N_USERS) + 8)
    indptr = np.zeros(N_USERS + 1, np.int64)
    np.cumsum(lens, out=indptr[1:])
    items = rng.integers(1, N_ITEMS, size=int(indptr[-1]), dtype=np.int64)
    meta = {"version": 1, "model": "LightGCN", "dataset": "gowalla_synth",
            "n_users": N_USERS, "n_items": N_ITEMS, "dim": D,
            "mask_splits": "all", "checkpoint": "synthetic"}
    with open(ART, "wb") as f:
        np.savez(f, user_table=user_table, item_table=item_table,
                 hist_indptr=indptr, hist_items=items,
                 user_tokens=np.asarray(
                     [str(i) for i in range(N_USERS)], dtype=object),
                 item_tokens=np.asarray(
                     [str(i) for i in range(N_ITEMS)], dtype=object),
                 meta=np.frombuffer(json.dumps(meta).encode(), np.uint8))
    print(f"artifact: {N_USERS}x{D} users, {N_ITEMS}x{D} items, "
          f"{indptr[-1]} history rows", flush=True)


def main():
    bs = [int(x) for x in next(
        (a[2:] for a in sys.argv[1:] if a.startswith("b=")),
        "1,64,1024").split(",")]
    k = int(next((a[2:] for a in sys.argv[1:] if a.startswith("k=")), "10"))
    build_artifact()

    from recbole_gnn_tpu.serve import RecServer
    t0 = time.time()
    srv = RecServer(ART)
    print(f"server load [{time.time() - t0:.1f}s]", flush=True)

    rng = np.random.default_rng(1)
    for b in bs:
        users = [str(u) for u in rng.integers(0, N_USERS, size=b)]
        t0 = time.time()
        srv.recommend(users, k=k)           # compile + first query
        print(f"B={b}: compile+1st {time.time() - t0:.1f}s", flush=True)
        lat = []
        for _ in range(12):
            users = [str(u) for u in rng.integers(0, N_USERS, size=b)]
            t0 = time.perf_counter()
            items, scores = srv.recommend(users, k=k)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(np.asarray(lat))
        p50, p99 = lat[len(lat) // 2], lat[-1]
        print(f"B={b:5d} k={k}: p50 {p50 * 1e3:7.1f} ms  worst "
              f"{p99 * 1e3:7.1f} ms  -> {b / p50:,.0f} users/s "
              f"({b * srv.n_items / p50 / 1e9:.1f}G item-scores/s)",
              flush=True)


if __name__ == "__main__":
    main()
