"""Compile + time ONE streaming-kernel config on real TPU.

Usage: python scripts/diag/pallas_one.py [n] [e] [d] [bm] [ec] [prec] [iters]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
e = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
bm = int(sys.argv[4]) if len(sys.argv) > 4 else 256
ec = int(sys.argv[5]) if len(sys.argv) > 5 else 512
prec = sys.argv[6] if len(sys.argv) > 6 else "f32x2"
iters = int(sys.argv[7]) if len(sys.argv) > 7 else 20

import jax
import jax.numpy as jnp
from recbole_gnn_tpu.ops.pallas_spmm import (
    build_pallas_meta, pad_edges, pallas_spmm)

rng = np.random.default_rng(0)
half = e // 2
u = rng.integers(0, n // 2, half)
i = rng.integers(n // 2, n, half)
src = np.concatenate([u, i])
dst = np.concatenate([i, u])
deg = np.bincount(dst, minlength=n).astype(np.float64)
dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
w = (dinv[src] * dinv[dst]).astype(np.float32)

sp_, dp_, wp_ = pad_edges(src, dst, w, n, ec=ec)
meta = build_pallas_meta(dp_, n, bm=bm, ec=ec)
print(f"n={n} e={e} d={d} bm={bm} ec={ec} {prec} "
      f"n_seg={meta.n_seg} seg={meta.seg} max_blk={meta.max_blk} "
      f"n_blocks={meta.n_blocks}", flush=True)

spj, dpj, wpj = jnp.asarray(sp_), jnp.asarray(dp_), jnp.asarray(wp_)
x0 = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)


@jax.jit
def chain(x):
    def body(xc, _):
        return pallas_spmm(spj, dpj, wpj, xc, meta, precision=prec)[:n], None
    out, _ = jax.lax.scan(body, x, None, length=iters)
    return out


t0 = time.perf_counter()
out = chain(x0)
v = float(out[0, 0])
print(f"compile+first run: {time.perf_counter()-t0:.1f}s  out[0,0]={v:.5f}",
      flush=True)

# correctness vs XLA single spmm
ref = jax.ops.segment_sum(x0[spj] * wpj[:, None], dpj, num_segments=n,
                          indices_are_sorted=True)
one = pallas_spmm(spj, dpj, wpj, x0, meta, precision=prec)[:n]
err = float(jnp.max(jnp.abs(one - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
print(f"max rel err vs xla: {err:.2e}", flush=True)

best = None
for _ in range(3):
    t0 = time.perf_counter()
    out = chain(x0)
    float(out[0, 0])
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
per = best / iters
gbps = e * (128 if prec == "f32x2" else 128) * (4 if prec == "f32x2" else 2) / per / 1e9
print(f"{per*1e3:.3f} ms/spmm  ({e/per/1e9:.2f} Gedge/s, "
      f"~{gbps:.0f} GB/s msg stream)", flush=True)
