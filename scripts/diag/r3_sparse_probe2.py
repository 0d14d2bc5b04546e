"""Round-3 probe 2 — given probe 1's finding (sorted segment-sum alone
is 9.9 ns/edge; gather only 4.5), measure the replacement reduction:

  E  pallas streaming f32x2, barrier=False   (r2 default form)
  F  pallas streaming f32x2, barrier=True    (bulk gather + MXU reduce)
  G  segsum only at d=128                    (cost ∝ rows or elements?)
  H  segsum only on a bf16 stream            (bandwidth or issue bound?)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 8
N, E, D = 500_000, 10_000_000, 64

rng = np.random.default_rng(1)
half = E // 2
u = rng.integers(0, 100_000, half)
i = rng.integers(100_000, N, half)
src = np.concatenate([u, i])
dst = np.concatenate([i, u])
deg = np.bincount(dst, minlength=N).astype(np.float64)
dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
w = (dinv[src] * dinv[dst]).astype(np.float32)
order = np.argsort(dst, kind="stable")
src, dst, w = src[order], dst[order], w[order]
dstj = jnp.asarray(dst.astype(np.int32))
wj = jnp.asarray(w)


def timed(name, f, x0):
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


def norm(y):
    return y / jnp.maximum(jnp.sqrt(jnp.mean(y * y)), 1e-6)


def run_pallas(barrier):
    from recbole_gnn_tpu.ops.pallas_spmm import (
        build_pallas_meta, pad_edges, pallas_spmm)
    sp_, dp_, wp_ = pad_edges(src, dst, w, N)
    meta = build_pallas_meta(dp_, N)
    spj, dpj, wpj = jnp.asarray(sp_), jnp.asarray(dp_), jnp.asarray(wp_)
    x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    @jax.jit
    def f(x):
        def step(xc, _):
            y = pallas_spmm(spj, dpj, wpj, xc, meta, precision="f32x2",
                            barrier=barrier)[:N]
            return norm(y), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed(f"pallas f32x2 barrier={barrier}", f, x0)


def run_segsum(d, dtype):
    x0 = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))

    @jax.jit
    def f(x):
        def step(xc, _):
            msgs = (xc[0][None, :] * wj[:, None]).astype(dtype)
            y = jax.ops.segment_sum(msgs, dstj, num_segments=N,
                                    indices_are_sorted=True)
            return norm(y.astype(jnp.float32)), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed(f"segsum only d={d} {dtype.__name__}", f, x0)


if __name__ == "__main__":
    which = sys.argv[1:] or ["e", "f", "g", "h"]
    for k in which:
        try:
            if k == "e":
                run_pallas(False)
            elif k == "f":
                run_pallas(True)
            elif k == "g":
                run_segsum(128, jnp.float32)
            elif k == "h":
                run_segsum(64, jnp.bfloat16)
        except Exception as ex:
            print(f"{k}: FAILED {type(ex).__name__}: {ex}", flush=True)
