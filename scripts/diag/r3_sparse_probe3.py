"""Round-3 probe 3 — bucketed-ELL SpMM (pure XLA).

Probes 1-2 established (v5e, bench shape 500k nodes / 10M edges / d=64):
  gather x[idx]      4.5 ns/row   (issue-bound: width/dtype/order-blind)
  sorted segment-sum 9.6 ns/edge  (per-ROW issue-bound, not bandwidth)
  pallas one-hot     ~9.5 ns/edge (EC-wide one-hot = 262 KFLOP/edge)

So the reduction must become a FIXED-SHAPE axis sum, which XLA streams
at bandwidth.  Host prep: group nodes by pow2-bucketed in-degree
(cap K_MAX, high-degree nodes split into virtual rows), pad each
node's edge list to the bucket degree with weight-0 edges; per bucket
the device op is  out_b = Σ_k x[idx[:, k]] · w[:, k]  — E_pad gathers
(the only per-row cost) + a streaming multiply-sum.  Virtual rows are
recombined with one (n_vrows,) sorted segment-sum (~N rows, cheap),
which also realizes the inverse node permutation.

Cases:
  I  bucketed-ELL fused
  J  bucketed-ELL with optimization_barrier after each gather
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 8
N, E, D = 500_000, 10_000_000, 64
K_MAX = 256

rng = np.random.default_rng(1)
half = E // 2
u = rng.integers(0, 100_000, half)
i = rng.integers(100_000, N, half)
src = np.concatenate([u, i])
dst = np.concatenate([i, u])
deg_f = np.bincount(dst, minlength=N).astype(np.float64)
dinv = np.where(deg_f > 0, 1.0 / np.sqrt(np.maximum(deg_f, 1e-12)), 0.0)
w = (dinv[src] * dinv[dst]).astype(np.float32)
order = np.argsort(dst, kind="stable")
src, dst, w = src[order], dst[order], w[order]


def build_ell(src, dst, w, n, k_max=K_MAX):
    """Host: bucketed-ELL layout.  Returns per-bucket (idx, w) padded
    arrays + (vrow→node) ids for the final combine segsum."""
    t0 = time.time()
    deg = np.bincount(dst, minlength=n)
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=rowptr[1:])
    buckets = {}
    # per node: n_vrows = ceil(deg / K_b), K_b = pow2 bucket of its
    # per-vrow degree (deg for small nodes, k_max for huge ones)
    per_vrow = np.minimum(np.maximum(deg, 1), k_max)
    kb = (2 ** np.ceil(np.log2(per_vrow))).astype(np.int64)
    n_vrows = -(-deg // kb)          # 0 for isolated nodes
    for K in np.unique(kb[deg > 0]):
        sel = np.where((kb == K) & (deg > 0))[0]
        vr = n_vrows[sel]
        tot = int(vr.sum())
        idx = np.zeros((tot, K), np.int32)
        ww = np.zeros((tot, K), np.float32)
        vnode = np.repeat(sel, vr).astype(np.int32)
        # vectorized fill: edge positions within each node's run
        starts = np.repeat(rowptr[sel], vr) + (
            np.arange(tot) - np.repeat(np.cumsum(vr) - vr, vr)) * K
        ends = np.minimum(starts + K, np.repeat(rowptr[sel + 1], vr))
        lens = (ends - starts).astype(np.int64)
        flat_rows = np.repeat(np.arange(tot), lens)
        flat_cols = np.arange(int(lens.sum())) - np.repeat(
            np.cumsum(lens) - lens, lens)
        flat_edge = np.repeat(starts, lens) + flat_cols
        idx[flat_rows, flat_cols] = src[flat_edge]
        ww[flat_rows, flat_cols] = w[flat_edge]
        buckets[int(K)] = (idx, ww, vnode)
    e_pad = sum(v[0].size for v in buckets.values())
    print(f"  ell build {time.time()-t0:.1f}s: buckets "
          f"{{{', '.join(f'{k}:{v[0].shape[0]}' for k, v in sorted(buckets.items()))}}} "
          f"E_pad/E = {e_pad/len(src):.3f}", flush=True)
    return buckets


def norm(y):
    return y / jnp.maximum(jnp.sqrt(jnp.mean(y * y)), 1e-6)


def run(buckets, barrier):
    bj = [(jnp.asarray(idx), jnp.asarray(ww), jnp.asarray(vn))
          for idx, ww, vn in buckets.values()]
    # combine: concat vrow results (bucket order), segsum by node id
    vnode_all = jnp.concatenate([vn for _, _, vn in bj])
    ordr = jnp.argsort(vnode_all, stable=True)
    vnode_sorted = vnode_all[ordr]
    x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    @jax.jit
    def f(x):
        def step(xc, _):
            outs = []
            for idx, ww, _vn in bj:
                g = xc[idx.reshape(-1)]
                if barrier:
                    g = jax.lax.optimization_barrier(g)
                g = g.reshape(idx.shape[0], idx.shape[1], D)
                outs.append(jnp.einsum("nkd,nk->nd", g, ww))
            vr = jnp.concatenate(outs, axis=0)[ordr]
            y = jax.ops.segment_sum(vr, vnode_sorted, num_segments=N,
                                    indices_are_sorted=True)
            return norm(y), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    name = f"ELL barrier={barrier}"
    t0 = time.time()
    out = f(x0)
    float(out.ravel()[0])
    print(f"  [{name}] compiled+first in {time.time()-t0:.0f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x0)
        float(out.ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    print(f"{name:34s}: {per*1e3:8.2f} ms/iter  "
          f"({per/E*1e9:6.2f} ns/edge)", flush=True)


def check(buckets):
    """Tiny correctness check vs numpy on first 4096 rows."""
    x = rng.normal(size=(N, D)).astype(np.float32)
    ref = np.zeros((4096, D))
    msk = dst < 4096
    np.add.at(ref, dst[msk], w[msk, None] * x[src[msk]].astype(np.float64))
    acc = np.zeros((N, D), np.float32)
    for idx, ww, vn in buckets.values():
        r = (x[idx] * ww[..., None]).sum(1)
        np.add.at(acc, vn, r)
    err = np.abs(acc[:4096] - ref).max()
    print(f"  ell correctness max|err| vs f64 ref: {err:.2e}", flush=True)


if __name__ == "__main__":
    buckets = build_ell(src, dst, w, N)
    check(buckets)
    for barrier in (False, True):
        try:
            run(buckets, barrier)
        except Exception as ex:
            print(f"barrier={barrier}: FAILED {type(ex).__name__}: {ex}",
                  flush=True)
