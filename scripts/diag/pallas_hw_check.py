"""Hardware correctness + gowalla-scale timing for the streaming SpMM.

1. Full-output check (ALL rows, not a 4096-row slice — the overrun bug
   corrupted the LAST blocks, invisible to slice checks) vs f64 numpy
   at n=50k/e=500k with a forced multi-segment layout, for every
   precision mode and the XLA path.
2. Honest (carry-dependent) timing at gowalla scale (1.4M nodes, 12M
   edges, d64) for pallas f32x2/packed — the decision number for the
   sparse_spmm_impl default (XLA path: 178 ms, primitives_bench).

Usage: python scripts/diag/pallas_hw_check.py [check|time|both]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.ops.pallas_spmm import (
    build_pallas_meta, pad_edges, pallas_spmm)

arg = sys.argv[1] if len(sys.argv) > 1 else "both"


def make(n, e, d, seed=0):
    rng = np.random.default_rng(seed)
    half = e // 2
    u = rng.integers(0, n // 2, half)
    i = rng.integers(n // 2, n, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    deg = np.bincount(dst, minlength=n).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    xs = rng.normal(size=(n, d)).astype(np.float32)
    return src, dst, w, xs


if arg in ("check", "both"):
    n, e, d = 50_000, 500_000, 64
    src, dst, w, xs = make(n, e, d)
    # force multiple segments + overrun geometry (seg_max 128k -> 4 seg)
    sp, dp, wp = pad_edges(src, dst, w, n, seg_max=1 << 17)
    meta = build_pallas_meta(dp, n, seg_max=1 << 17)
    print(f"check: n_seg={meta.n_seg} max_blk={meta.max_blk} "
          f"n_blocks={meta.n_blocks} overrun="
          f"{int(np.asarray(meta.blk_lo).max()) + meta.max_blk > meta.n_blocks}",
          flush=True)
    ref = np.zeros((n, d))
    np.add.at(ref, dp, np.asarray(wp)[:, None]
              * xs[sp].astype(np.float64))
    spj, dpj, wpj = jnp.asarray(sp), jnp.asarray(dp), jnp.asarray(wp)
    x0 = jnp.asarray(xs)
    rowmag = np.maximum(np.abs(ref).max(axis=1), 1e-2)
    for mode in ("packed", "f32x2", "bf16"):
        out = np.asarray(pallas_spmm(spj, dpj, wpj, x0, meta,
                                     precision=mode)[:n])
        rel = (np.abs(out - ref).max(axis=1) / rowmag)
        print(f"check {mode:6s}: max row-rel err {rel.max():.2e} "
              f"(worst row {int(rel.argmax())})", flush=True)
    msgs = x0.at[spj].get() * wpj[:, None]
    ox = np.asarray(jax.ops.segment_sum(msgs, dpj, num_segments=n,
                                        indices_are_sorted=True))
    rel = (np.abs(ox - ref).max(axis=1) / rowmag)
    print(f"check xla   : max row-rel err {rel.max():.2e}", flush=True)

if arg in ("time", "both"):
    n, e, d = 1_400_000, 12_000_000, 64
    src, dst, w, xs = make(n, e, d, seed=1)
    sp, dp, wp = pad_edges(src, dst, w, n)
    meta = build_pallas_meta(dp, n)
    spj, dpj, wpj = jnp.asarray(sp), jnp.asarray(dp), jnp.asarray(wp)
    x0 = jnp.asarray(xs)
    ITERS = 5
    for mode in ("f32x2", "packed"):
        def chain(x):
            def body(xc, _):
                return pallas_spmm(spj, dpj, wpj, xc, meta,
                                   precision=mode)[:n], None
            out, _ = jax.lax.scan(body, x, None, length=ITERS)
            return out
        f = jax.jit(chain)
        t0 = time.perf_counter()
        out = f(x0)
        float(out[0, 0])
        c = time.perf_counter() - t0
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = f(x0)
            float(out[0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"gowalla {mode:6s}: {best/ITERS*1e3:7.1f} ms/spmm "
              f"({e/(best/ITERS)/1e9:5.2f} Ge/s) [compile {c:.0f}s]",
              flush=True)
