"""Sweep the streaming Pallas SpMM tile sizes on real TPU.

Usage:  python scripts/diag/pallas_stream_sweep.py [--scale mid|gowalla]

Times forward spmm over a synthetic power-law-ish square graph for a
grid of (BM, EC, precision), plus the XLA chunked fallback reference.
Chains ITERS spmm calls in one lax.scan so tunnel dispatch latency
does not pollute ~ms measurements.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_graph(n, e, rng):
    # bipartite-ish lifted square graph with both directions, like the
    # benchmark LightGCN adjacency
    half = e // 2
    u = rng.integers(0, n // 2, half)
    i = rng.integers(n // 2, n, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    deg = np.bincount(dst, minlength=n).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    return src.astype(np.int64), dst.astype(np.int64), w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="mid", choices=["mid", "gowalla"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from recbole_gnn_tpu.ops import pallas_spmm as ps
    from recbole_gnn_tpu.ops.pallas_spmm import (
        build_pallas_meta, pad_edges)
    from recbole_gnn_tpu.ops.spmm import spmm_coo

    if args.scale == "mid":
        n, e, d = 200_000, 2_000_000, 64
    else:
        n, e, d = 1_400_000, 12_000_000, 64

    rng = np.random.default_rng(0)
    src, dst, w = make_graph(n, e, rng)
    x0 = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    print(f"scale={args.scale} n={n} e={e} d={d} "
          f"stream={e*128*4/1e9:.2f}GB(f32,128lanes)", flush=True)

    def timed(fn, x):
        out = fn(x)
        float(out[0, 0])  # sync
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(x)
            float(out[0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best / args.iters

    iters = args.iters

    # XLA chunked reference
    sj, dj = jnp.asarray(np.argsort(dst, kind="stable")), None
    order = np.argsort(dst, kind="stable")
    s_s, d_s, w_s = (jnp.asarray(src[order].astype(np.int32)),
                     jnp.asarray(dst[order].astype(np.int32)),
                     jnp.asarray(w[order]))

    @jax.jit
    def xla_chain(x):
        def body(xc, _):
            o = spmm_coo(s_s, d_s, w_s, xc, n)
            return o, None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    t = timed(xla_chain, x0)
    print(f"xla_chunked           : {t*1e3:8.3f} ms/spmm  "
          f"({e/t/1e9:6.2f} Gedge/s)", flush=True)

    for bm in (64, 256, 512):
        for ec in (512, 1024, 2048):
            for prec in ("f32x2", "bf16"):
                sp, dp, wp = pad_edges(src, dst, w, n, ec=ec)
                meta = build_pallas_meta(dp, n, bm=bm, ec=ec)
                spj = jnp.asarray(sp)
                dpj = jnp.asarray(dp)
                wpj = jnp.asarray(wp)

                @jax.jit
                def chain(x, spj=spj, dpj=dpj, wpj=wpj, meta=meta,
                          prec=prec):
                    def body(xc, _):
                        o = ps.pallas_spmm(spj, dpj, wpj, xc, meta,
                                           precision=prec)[:n]
                        return o, None
                    out, _ = jax.lax.scan(body, x, None, length=iters)
                    return out

                try:
                    t = timed(chain, x0)
                    print(f"bm={bm:4d} ec={ec:5d} {prec:5s}: "
                          f"{t*1e3:8.3f} ms/spmm  "
                          f"({e/t/1e9:6.2f} Gedge/s, "
                          f"n_seg={meta.n_seg} max_blk={meta.max_blk})",
                          flush=True)
                except Exception as ex:
                    print(f"bm={bm:4d} ec={ec:5d} {prec:5s}: FAILED "
                          f"{type(ex).__name__}: {str(ex)[:200]}",
                          flush=True)


if __name__ == "__main__":
    main()
