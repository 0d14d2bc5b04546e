"""Honest (carry-dependent) test: does unfusing the XLA gather from its
multiply/split consumers (optimization_barrier) speed the streaming
Pallas SpMM?

Hypothesis: the composite gather+multiply fusion runs row-serial
(~14 ns/row) while a bare gather copy runs ~4-5 ns/row; the barrier
trades one extra stream round-trip (~1 ms/GB) for the fast gather form.

Usage: python scripts/diag/pallas_barrier.py [small|big|both]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.ops.pallas_spmm import (
    build_pallas_meta, pad_edges, pallas_spmm)

ITERS = 5
arg = sys.argv[1] if len(sys.argv) > 1 else "both"
SHAPES = []
if arg in ("small", "both"):
    SHAPES.append(("2M", 200_000, 2_000_000))
if arg in ("big", "both"):
    SHAPES.append(("gowalla", 1_400_000, 12_000_000))


def run_shape(tag, n, e):
    d = 64
    rng = np.random.default_rng(0)
    half = e // 2
    u = rng.integers(0, n // 2, half)
    i = rng.integers(n // 2, n, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    deg = np.bincount(dst, minlength=n).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    xs = rng.normal(size=(n, d)).astype(np.float32)

    order = np.argsort(dst, kind="stable")
    ss, dd, ww = src[order], dst[order], w[order]
    ref_rows = 4096
    msk = dd < ref_rows
    ref = np.zeros((ref_rows, d))
    np.add.at(ref, dd[msk], ww[msk, None] * xs[ss[msk]].astype(np.float64))

    x0 = jnp.asarray(xs)
    sp_, dp_, wp_ = pad_edges(src, dst, w, n)
    meta = build_pallas_meta(dp_, n)
    spj, dpj, wpj = jnp.asarray(sp_), jnp.asarray(dp_), jnp.asarray(wp_)

    for mode in ("packed", "f32x2"):
        for barrier in (True, False):
            def chain(x):
                def body(xc, _):
                    o = pallas_spmm(spj, dpj, wpj, xc, meta,
                                    precision=mode, barrier=barrier)[:n]
                    return o, None
                out, _ = jax.lax.scan(body, x, None, length=ITERS)
                return out

            f = jax.jit(chain)
            try:
                t0 = time.perf_counter()
                out = f(x0)
                float(out[0, 0])
                c = time.perf_counter() - t0
            except Exception as ex:
                print(f"{tag} {mode} barrier={barrier}: FAIL "
                      f"{str(ex)[:100]}", flush=True)
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                out = f(x0)
                float(out[0, 0])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            one = np.asarray(pallas_spmm(spj, dpj, wpj, x0, meta,
                                         precision=mode,
                                         barrier=barrier)[:ref_rows])
            denom = np.maximum(np.abs(ref), 1e-3)
            relerr = float(np.max(np.abs(one - ref) / denom))
            print(f"{tag} {mode:6s} barrier={int(barrier)}: "
                  f"{best/ITERS*1e3:7.1f} ms/spmm "
                  f"({e/(best/ITERS)/1e9:5.2f} Ge/s) relerr {relerr:.2e} "
                  f"[compile {c:.0f}s]", flush=True)


for tag, n, e in SHAPES:
    run_shape(tag, n, e)
