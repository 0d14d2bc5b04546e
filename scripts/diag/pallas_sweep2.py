"""Honest (carry-dependent) sweep of the streaming Pallas SpMM.

Covers the revised packed mode (XLA-side w-multiply + hi/lo split,
single one-hot pass) vs f32x2/bf16, at 2M-edge and gowalla scale,
with a couple of BM/EC tilings.  Also prints the end-to-end spmm()
dispatch (gather included) and a correctness check vs f64 numpy.

Usage: python scripts/diag/pallas_sweep2.py [small|big|both]
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

    # f64 reference on a slice of rows
    order = np.argsort(dst, kind="stable")
    ss, dd, ww = src[order], dst[order], w[order]
    ref_rows = 4096
    msk = dd < ref_rows
    ref = np.zeros((ref_rows, d))
    np.add.at(ref, dd[msk], ww[msk, None] * xs[ss[msk]].astype(np.float64))

    x0 = jnp.asarray(xs)

    for bm, ec in ((512, 4096), (256, 2048), (1024, 4096)):
        sp_, dp_, wp_ = pad_edges(src, dst, w, n, ec=ec)
        meta = build_pallas_meta(dp_, n, bm=bm, ec=ec)
        spj, dpj, wpj = jnp.asarray(sp_), jnp.asarray(dp_), jnp.asarray(wp_)
        for mode in ("packed", "f32x2", "bf16"):
            if (bm, ec) != (512, 4096) and mode != "packed":
                continue

            def chain(x):
                def body(xc, _):
                    o = pallas_spmm(spj, dpj, wpj, xc, meta,
                                    precision=mode)[:n]
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
                print(f"{tag} bm{bm} ec{ec} {mode}: FAIL {str(ex)[:80]}",
                      flush=True)
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                out = f(x0)
                float(out[0, 0])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            # one-step correctness vs f64 ref
            one = pallas_spmm(spj, dpj, wpj, x0, meta,
                              precision=mode)[:ref_rows]
            one = np.asarray(one)
            denom = np.maximum(np.abs(ref), 1e-3)
            relerr = float(np.max(np.abs(one - ref) / denom))
            print(f"{tag} bm{bm} ec{ec} {mode:6s}: "
                  f"{best/ITERS*1e3:7.1f} ms/spmm "
                  f"({e/(best/ITERS)/1e9:5.2f} Ge/s) relerr {relerr:.2e} "
                  f"[compile {c:.0f}s]", flush=True)


for tag, n, e in SHAPES:
    run_shape(tag, n, e)
