"""Benchmark harness — LightGCN training throughput on real hardware.

Prints the driver metric as the FIRST JSON line ({"metric", "value",
"unit", "vs_baseline"} — unchanged across rounds for comparability),
then a second JSON line for the forced-sparse streaming-Pallas SpMM at
a scale where the dense path is infeasible (500k nodes, 10M edges) so
a sparse-kernel regression is driver-visible (VERDICT r1 #2).  Set
BENCH_SKIP_SPARSE=1 to print only the first line.

Workload: LightGCN (3 layers, dim 64, BPR) on a synthetic bipartite
graph at ml-1m scale (~30k nodes, 1M interactions → 2M directed edges),
batch 4096 — the structural hot loop of the reference (SURVEY.md §3.2:
full-graph propagation per minibatch).  Metric: propagated
edge-features per second per chip, forward-edge count × n_layers
(backward pass not counted — consistent across rounds).

vs_baseline divides by BASELINE_EDGES_PER_S — a fixed reference-point
estimate of the PyG/torch-sparse CUDA path from the reference's own
efficiency claim (README.md:10: sparse path ≈5× over dense, LightGCN
ml-1m epoch ≈ 6s on a single GPU → ~3.3e9 edge-features/s; recorded
here once so every round is comparable)."""

import functools
import json
import time

import numpy as np

BASELINE_EDGES_PER_S = 3.3e9

N_USERS = 6_041
N_ITEMS = 3_630
N_INTER = 1_000_000
DIM = 64
N_LAYERS = 3
BATCH = 4096
N_STEPS = 60
WARMUP = 10


def main():
    import jax
    import jax.numpy as jnp

    from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
    from recbole_gnn_tpu.models.layers import lightgcn_propagate
    from recbole_gnn_tpu.ops.spmm import build_dense_bipartite
    from recbole_gnn_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(0)
    users = rng.integers(1, N_USERS, N_INTER).astype(np.int64)
    items = rng.integers(1, N_ITEMS, N_INTER).astype(np.int64)
    n = N_USERS + N_ITEMS
    src = np.concatenate([users, items + N_USERS])
    dst = np.concatenate([items + N_USERS, users])
    deg = np.bincount(dst, minlength=n).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = dinv[src] * dinv[dst]
    # the default representation at this scale: dense bipartite (MXU)
    graph = build_dense_bipartite(users, items, w[:N_INTER], N_USERS, N_ITEMS)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "user_emb": jax.random.normal(k1, (N_USERS, DIM)) * 0.1,
        "item_emb": jax.random.normal(k2, (N_ITEMS, DIM)) * 0.1,
    }
    optimizer = make_optimizer("adam", 1e-3)
    opt_state = optimizer.init(params)

    def loss_fn(p, graph, batch):
        ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
        layers = lightgcn_propagate(graph, ego, N_LAYERS)
        final = jnp.mean(jnp.stack(layers, 0), 0)
        u, i = final[:N_USERS], final[N_USERS:]
        ue = u[batch["user"]]
        pos = jnp.sum(ue * i[batch["pos"]], -1)
        neg = jnp.sum(ue * i[batch["neg"]], -1)
        reg = emb_loss([p["user_emb"][batch["user"]],
                        p["item_emb"][batch["pos"]],
                        p["item_emb"][batch["neg"]]], BATCH, require_pow=True)
        return bpr_loss(pos, neg) + 1e-5 * reg

    @jax.jit
    def run_window(params, opt_state, graph, batches):
        # one dispatch for the whole measurement window (lax.scan over
        # pre-staged batches): per-call transport latency would swamp
        # ~2ms steps.  graph passed as an argument: closure-captured
        # edge arrays bake into the HLO as literals and stall compile.
        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, graph, batch)
            params, opt_state = optimizer.update(grads, opt_state, params)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), batches)
        return params, opt_state, losses[-1]

    def make_batches(k):
        lo = np.arange(k)[:, None] * BATCH % (N_INTER - BATCH)
        idx = lo + np.arange(BATCH)[None, :]
        return {"user": users[idx], "pos": items[idx],
                "neg": rng.integers(1, N_ITEMS, (k, BATCH))}

    warm = make_batches(WARMUP)
    params, opt_state, loss = run_window(params, opt_state, graph, warm)
    float(loss)  # hard sync: block_until_ready is advisory over the tunnel

    def time_window(batches, reduce=min, reps=3):
        ts = []
        for _rep in range(reps):
            t0 = time.perf_counter()
            p2, o2, loss = run_window(params, opt_state, graph, batches)
            float(loss)
            ts.append(time.perf_counter() - t0)
        return reduce(ts)

    batches = jax.device_put(make_batches(N_STEPS))
    dt = time_window(batches)   # best of 3 — transport noise

    # drift-robust companion (VERDICT r3 #7): the wall clock includes
    # the axon tunnel's per-dispatch transport latency, which drifts
    # ±25% day-to-day and once masqueraded as a code regression
    # (BENCH_r02).  Differencing two window sizes cancels every fixed
    # per-dispatch cost: device_ms ≈ (T(2N) − T(N)) / N.  MEDIANS of 5,
    # not minima: min(T(N)) − min(T(2N)) differences two independent
    # extremes and once produced an impossible >1 MFU; the median pair
    # differences the typical dispatch instead.
    def median(ts):
        return sorted(ts)[len(ts) // 2]
    batches2 = jax.device_put(make_batches(2 * N_STEPS))
    _, _, warm_loss = run_window(params, opt_state, graph, batches2)
    float(warm_loss)   # force the 2N compile+run before timing resumes
    dt_med = time_window(batches, reduce=median, reps=5)
    dt2_med = time_window(batches2, reduce=median, reps=5)
    dev_step_s = max((dt2_med - dt_med) / N_STEPS, 1e-9)

    steps_per_s = N_STEPS / dt
    edges_per_step = N_LAYERS * graph.n_edges
    edges_per_s = steps_per_s * edges_per_step
    dev_edges_per_s = edges_per_step / dev_step_s
    print(json.dumps({
        "metric": "lightgcn_spmm_edge_features_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edge-feat/s (fwd, 3 layers x 2M edges, dim 64, B=4096)",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
        "wall_ms_per_step": round(dt / N_STEPS * 1e3, 4),
        "device_ms_per_step": round(dev_step_s * 1e3, 4),
        "device_edge_feat_per_s": round(dev_edges_per_s, 1),
        "device_vs_baseline": round(dev_edges_per_s / BASELINE_EDGES_PER_S,
                                    4),
    }), flush=True)
    return dt / N_STEPS, dev_step_s


# v5e per-chip hardware ceilings for the roofline line (public specs:
# ~197 TFLOP/s bf16 / ~98 TFLOP/s f32-on-MXU, ~819 GB/s HBM).
# NOTE: the default JAX matmul precision on TPU is bf16-class (see
# CLAUDE.md), so the dense step's matmuls ride the bf16 MXU rate —
# `mfu` (vs f32 peak) can legitimately exceed 1.0; `mfu_bf16_peak`
# is the honest utilization figure for the default-precision path.
V5E_PEAK_FLOPS_F32 = 98e12
V5E_PEAK_FLOPS_BF16 = 197e12
V5E_HBM_GBS = 819e9


def _dense_roofline(step_seconds: float) -> dict:
    """Achieved FLOP/s (exact count) + modeled-MINIMUM HBM GB/s of the
    dense driver step vs v5e ceilings (VERDICT r2 #7: 'speed-of-light'
    claims need a roofline column).  FLOPs: 2 MXU matmuls (U·I·D) per
    layer forward; backward ≈ 2× forward (dA grads skipped — A is a
    constant).  Bytes: modeled minimum — the 88 MB adjacency fits VMEM
    so XLA may read it from HBM as little as once per step; plus one
    read+write of params and both Adam moments.  The exact traffic
    needs a profile; the minimum makes hbm_util a floor, mfu is exact."""
    fwd_flops = N_LAYERS * 2 * (2 * N_USERS * N_ITEMS * DIM)
    flops = 3 * fwd_flops               # fwd + ~2x bwd
    a_bytes = N_USERS * N_ITEMS * 4
    table_bytes = (N_USERS + N_ITEMS) * DIM * 4
    bytes_ = a_bytes + 6 * table_bytes  # A once + params/m/v r+w
    return {
        "flops_per_s": flops / step_seconds,
        "hbm_gbs_min": bytes_ / step_seconds / 1e9,
        "mfu": flops / step_seconds / V5E_PEAK_FLOPS_F32,
        "mfu_bf16_peak": flops / step_seconds / V5E_PEAK_FLOPS_BF16,
        "hbm_util_min": bytes_ / step_seconds / V5E_HBM_GBS,
    }


def _sparse_roofline(layer_seconds: float, e_padded: int) -> dict:
    """Sparse ELL layer: FLOPs are trivial (2·E·D multiply-add); the
    honest ceiling is HBM traffic — gathered rows (E_pad·D·4) + idx/w
    (E_pad·8) + combine (~3 passes over N·D·4).  hbm_util < 1 here is
    REAL headroom: the per-row gather runs at ~4.5 ns/row, ~16× above
    the random-transaction roofline (PARITY.md round-3 section)."""
    flops = 2 * SP_N_EDGES * SP_DIM
    bytes_ = e_padded * (SP_DIM * 4 + 8) + 3 * SP_N_NODES * SP_DIM * 4
    return {
        "flops_per_s": flops / layer_seconds,
        "hbm_gbs_min": bytes_ / layer_seconds / 1e9,
        "mfu": flops / layer_seconds / V5E_PEAK_FLOPS_F32,
        "hbm_util_min": bytes_ / layer_seconds / V5E_HBM_GBS,
    }


# forced-sparse bench: a catalog where the dense bipartite block would
# be 100k x 400k = 4e10 entries (160 GB) — only the sparse path exists.
SP_N_NODES = 500_000
SP_N_EDGES = 10_000_000
SP_DIM = 64
SP_ITERS = 8


def sparse_main():
    import jax
    import jax.numpy as jnp

    from recbole_gnn_tpu.ops.spmm import build_graph, spmm

    rng = np.random.default_rng(1)
    n, e = SP_N_NODES, SP_N_EDGES
    half = e // 2
    u = rng.integers(0, 100_000, half)
    i = rng.integers(100_000, n, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    deg = np.bincount(dst, minlength=n).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    # the production sparse path: Graph + spmm() (impl dispatch —
    # XLA sorted segment-sum by default, streaming Pallas via
    # sparse_spmm_impl) with the custom transpose-VJP attached
    graph = build_graph(src, dst, w, n, with_pallas=True)
    x0 = jnp.asarray(rng.normal(size=(n, SP_DIM)), jnp.float32)

    @jax.jit
    def chain(g, x):
        def body(xc, _):
            return spmm(g, xc), None
        out, _ = jax.lax.scan(body, x, None, length=SP_ITERS)
        return out
    chain = functools.partial(chain, graph)

    out = chain(x0)
    float(out[0, 0])
    dt = None
    for _rep in range(3):
        t0 = time.perf_counter()
        out = chain(x0)
        float(out[0, 0])
        wtime = time.perf_counter() - t0
        dt = wtime if dt is None else min(dt, wtime)
    per = dt / SP_ITERS
    edges_per_s = SP_N_EDGES / per   # one chained spmm == one layer
    # hardware gather floor (PARITY.md round-4 floor proof): any sparse
    # impl must gather E_pad source rows at the measured-irreducible
    # ~5.1 ns/row at this table size (ADVICE-corrected full-consume
    # probe, r3_gather_scaling.py; per-row Pallas DMA: 43 ns/row;
    # promise_in_bounds / unfusing / bf16: no change or worse) —
    # vs_gather_floor is the fraction of that hardware ceiling this
    # layer achieves (1.0 = speed of light)
    e_pad = (graph.ell.e_padded if graph.ell is not None else SP_N_EDGES)
    floor_ns = 5.1 * e_pad / SP_N_EDGES
    ns_edge = per / SP_N_EDGES * 1e9
    print(json.dumps({
        "metric": "sparse_streaming_spmm_edge_features_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": f"edge-feat/s (fwd, {SP_N_EDGES} edges x dim {SP_DIM}, "
                f"500k nodes, forced sparse)",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
        "ns_per_edge": round(ns_edge, 2),
        "gather_floor_ns_per_edge": round(floor_ns, 2),
        "vs_gather_floor": round(floor_ns / ns_edge, 4),
    }), flush=True)
    return per, e_pad


if __name__ == "__main__":
    import os
    step_s, dev_step_s = main()
    # vs_baseline mirrors line 1 (the driver records the LAST line; a
    # 0.0 here would read as a regression in automated tracking)
    dense_vsb = (N_STEPS and round(
        N_LAYERS * 2 * N_INTER / step_s / BASELINE_EDGES_PER_S, 4))
    roof = {"metric": "roofline", "value": 0.0, "unit": "see fields",
            "vs_baseline": dense_vsb}
    roof["dense"] = {k: round(v, 4 if "util" in k or k == "mfu" else 1)
                     for k, v in _dense_roofline(step_s).items()}
    # transport-free companion (VERDICT r3 #7): same roofline on the
    # two-window-differenced device time — drift in the tunnel's fixed
    # per-dispatch cost cannot move this one
    roof["dense_device"] = {
        k: round(v, 4 if "util" in k or k == "mfu" else 1)
        for k, v in _dense_roofline(dev_step_s).items()}
    if not os.environ.get("BENCH_SKIP_SPARSE"):
        try:
            layer_s, e_pad = sparse_main()
            roof["sparse"] = {
                k: round(v, 4 if "util" in k or k == "mfu" else 1)
                for k, v in _sparse_roofline(layer_s, e_pad).items()}
        except Exception as ex:  # sparse line is additive — never break
            print(json.dumps({                       # the driver metric
                "metric": "sparse_streaming_spmm_edge_features_per_s_per_chip",
                "value": 0.0, "unit": f"FAILED: {type(ex).__name__}",
                "vs_baseline": 0.0}), flush=True)
    # third line (VERDICT r2 #7): achieved FLOP/s + HBM GB/s vs v5e
    # ceilings; lines 1-2 stay byte-compatible across rounds
    roof["value"] = roof["dense"]["mfu"]
    roof["unit"] = "dense-step MFU (f32 MXU peak); see dense/sparse fields"
    print(json.dumps(roof), flush=True)
