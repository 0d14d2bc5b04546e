"""Round-3 probe 6 — where do case R's 181 ms go?

Accounting: 17.1M padded slots x 4.7 ns gather = 80 ms, combine
segsum over ~1.5M vrows = ~14 ms, axis-sum ~9 ms, order-gather ~7 ms
=> ~110 ms expected, 181 observed.  This probe times the production
ell_spmm piecewise on the EXACT case-R graph:

  G   per-bucket gather+einsum only (no combine) — sum of bucket
      outputs' first elements keeps everything live
  H   combine only: order-gather + segsum over a precomputed vr
  F   full ell_spmm (same as case R, sanity)
  S   per-bucket shapes + which buckets chunk
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 8


def timed(name, f, x0, per_div):
    t0 = time.time()
    out = f(x0)
    float(jnp.asarray(out).ravel()[0])
    print(f"  [{name}] compiled+first in {time.time()-t0:.0f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x0)
        float(jnp.asarray(out).ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    print(f"{name:44s}: {per*1e3:8.2f} ms/iter  "
          f"({per/per_div*1e9:6.2f} ns/edge)", flush=True)
    return per


def norm(y):
    return y / jnp.maximum(jnp.sqrt(jnp.mean(y * y)), 1e-6)


def main():
    N, E, D = 1_400_000, 12_000_000, 64
    rng = np.random.default_rng(3)
    half = E // 2
    u = rng.integers(0, 100_000, half)
    i = rng.integers(100_000, N, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    deg = np.bincount(dst, minlength=N).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    order = np.argsort(dst, kind="stable")
    from recbole_gnn_tpu.ops.ell_spmm import (
        BUCKET_BYTES_BUDGET, bucket_gather_sum, build_ell, ell_spmm)
    t0 = time.time()
    meta = build_ell(src[order], dst[order], w[order], N)
    print(f"built in {time.time()-t0:.0f}s  E_pad/E="
          f"{meta.e_padded/E:.3f}  "
          f"n_vrows={sum(int(i.shape[0]) for i in meta.idxs)}",
          flush=True)
    for idx in meta.idxs:
        n_b, k = idx.shape
        by = n_b * k * D * 4
        print(f"  bucket K={k:4d}  rows={n_b:9d}  slots={n_b*k:9d}  "
              f"msg={by/2**30:.2f} GiB  "
              f"{'CHUNKED' if by > BUCKET_BYTES_BUDGET else ''}",
              flush=True)

    x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    @jax.jit
    def g_only(x):
        def step(xc, _):
            acc = 0.0
            for idx, ww in zip(meta.idxs, meta.ws):
                # production chunked kernel (ADVICE r3: calling the raw
                # _bucket_sum bypassed BUCKET_BYTES_BUDGET chunking);
                # FULL reduction keeps every output row live (a sum of
                # o[:1] lets XLA's slice-of-dot simplification shrink
                # each bucket to one row)
                o = bucket_gather_sum(xc, idx, ww, D)
                acc = acc + jnp.sum(o)
            return norm(xc + 1e-12 * acc), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed("G gathers+einsum only", g_only, x0, E)

    n_vrows = sum(int(i.shape[0]) for i in meta.idxs)
    vr0 = jnp.asarray(rng.normal(size=(n_vrows, D)).astype(np.float32))

    @jax.jit
    def h_only(v):
        def step(vc, _):
            # r4 combine: pool = [vr; multi sums; zero row], one gather
            pool = [vc]
            if meta.n_multi:
                msums = jax.ops.segment_sum(vc[meta.mgidx], meta.msegs,
                                            num_segments=meta.n_multi,
                                            indices_are_sorted=True)
                pool.append(msums)
            pool.append(jnp.zeros((1, D), vc.dtype))
            o = jnp.concatenate(pool, axis=0)[meta.node_src]
            # feed the carry with an explicitly shaped slice+pad (ADVICE
            # r3: o[:n_vrows] trace-crashes when n_vrows > n_nodes) and
            # keep the rest live via a full reduction
            m = min(n_vrows, int(meta.n_nodes))
            upd = jnp.pad(o[:m], ((0, n_vrows - m), (0, 0)))
            return norm(vc + 1e-6 * upd + 1e-12 * jnp.sum(o)), None
        out, _ = jax.lax.scan(step, v, None, length=ITERS)
        return out

    timed("H combine only (pool-gather)", h_only, vr0, E)

    @jax.jit
    def full(x):
        def step(xc, _):
            return norm(ell_spmm(meta, xc)), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed("F full ell_spmm", full, x0, E)


if __name__ == "__main__":
    main()
