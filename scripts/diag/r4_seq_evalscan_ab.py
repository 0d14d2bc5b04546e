"""Sequential eval dispatch A/B at diginetica scale (VERDICT r3 #5).

Measures a FULL full-sort eval pass (wall time, incl. per-dispatch
tunnel latency — the thing eval_scan exists to amortize) for SRGNN
over a diginetica-shaped eval split: 72k sessions (the reference
test split ≈ 10% of 719k augmented rows), 29454 items, L=20,
B=4096 → 18 batches.

A: per-batch loop (`eval_scan: false`) — 18 device dispatches
B: chunked scan (`eval_scan: 32`)     — 1 dispatch
Also at B=2048 (36 batches) to show the dispatch-count scaling.

The two paths are equality-tested in
tests/test_eval.py::test_sequential_eval_scan_matches_per_batch_loop;
this probe only times them on hardware.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from recbole_gnn_tpu.config import Config
from recbole_gnn_tpu.eval.evaluator import Evaluator
from recbole_gnn_tpu.models.sequential.srgnn import SRGNN

N_ITEMS, L, N_EVAL = 29_454, 20, 72_000


class DS:
    n_users, n_items, inter_num = 1, N_ITEMS, N_EVAL


def synth_sessions(rng, n):
    lens = np.clip(rng.geometric(0.25, n) + 1, 2, L).astype(np.int64)
    seqs = np.zeros((n, L), np.int64)
    for i in range(n):
        m = lens[i]
        s = rng.integers(1, N_ITEMS, m)
        rep = rng.random(m) < 0.15
        for j in range(1, m):
            if rep[j]:
                s[j] = s[rng.integers(0, j)]
        seqs[i, :m] = s
    return seqs, lens


def make_batches(seqs, lens, B):
    from recbole_gnn_tpu.native import build_session_graphs_native
    from recbole_gnn_tpu.data.session import (
        SessionGraphDataset, _alias_per_row, _unique_per_row)
    native = build_session_graphs_native(seqs, lens)
    if native is not None:
        x, n_nodes, alias, src, dst, n_edges = native
    else:
        x, n_nodes = _unique_per_row(seqs)
        alias = _alias_per_row(x, n_nodes, seqs, lens)
        src, dst, n_edges = SessionGraphDataset._consecutive_edges(
            alias, lens, L)
    tgt = np.zeros(len(seqs), np.int64)
    for i, m in enumerate(lens):
        tgt[i] = seqs[i, m - 1]
    batches = []
    for lo in range(0, len(seqs), B):
        hi = min(lo + B, len(seqs))
        pad = B - (hi - lo)
        def p(a):
            return np.pad(a[lo:hi], [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        b = {"x": p(x), "n_nodes": p(n_nodes), "alias_inputs": p(alias),
             "edge_src": p(src), "edge_dst": p(dst), "n_edges": p(n_edges),
             "item_seq_len": np.maximum(p(lens), 1),
             "pos_items": p(tgt.reshape(-1, 1)),
             "pos_len": np.ones(B, np.int64),
             "weight": np.pad(np.ones(hi - lo, np.float32), (0, pad))}
        batches.append(b)
    return batches


class ListLoader(list):
    pass


def time_eval(tag, cfg, model, params, batches):
    ev = Evaluator(cfg, model)
    t0 = time.time()
    r = ev.evaluate(params, {}, ListLoader(batches))
    print(f"  [{tag}] compile+1st pass {time.time()-t0:.1f}s "
          f"ndcg@10={r.get('ndcg@10', 0):.4f}", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        ev.evaluate(params, {}, ListLoader(batches))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag}: eval pass {best:.2f} s ({len(batches)} batches)",
          flush=True)
    return best


if __name__ == "__main__":
    if len(sys.argv) > 1:       # smoke: r4_seq_evalscan_ab.py 2000
        N_EVAL = int(sys.argv[1])
    rng = np.random.default_rng(0)
    t0 = time.time()
    seqs, lens = synth_sessions(rng, N_EVAL)
    print(f"sessions built [{time.time()-t0:.0f}s]", flush=True)
    for B in (4096, 2048):
        batches = make_batches(seqs, lens, B)
        cfg_loop = Config(model="SRGNN", dataset="synthetic",
                          config_dict={"data_path": "/nonexistent",
                                       "eval_scan": False})
        cfg_scan = Config(model="SRGNN", dataset="synthetic",
                          config_dict={"data_path": "/nonexistent",
                                       "eval_scan": 32})
        model = SRGNN(cfg_loop, DS())
        params = model.init_params(jax.random.PRNGKey(0))
        a = time_eval(f"B={B} loop", cfg_loop, model, params, batches)
        b = time_eval(f"B={B} scan32", cfg_scan, model, params, batches)
        print(f"B={B}: loop {a:.2f}s vs scan {b:.2f}s  ({a/b:.2f}x)",
              flush=True)
