"""Round-3 sparse SpMM probe — where do the 14.9 ns/edge go, and does
unfusing the gather (optimization_barrier) recover the 5 ns/row bulk
form inside the FULL XLA segsum SpMM?

PARITY r2 knowns (v5e): bare gather 4.1-5.0 ns/row; full XLA
gather+multiply+sorted-segsum 13.97-14.85 ns/edge.  If the composite
fuses the gather into a row-serial loop, a barrier between gather and
consumers should drop the full op to ~6-7 ns/edge.

Cases (honest carry-dependent scan chains, bench shape 500k nodes /
10M edges / d=64):
  A  spmm_coo current form (fused gather)            [expect ~149 ms]
  B  barrier(x[src]) then multiply+segsum            [hypothesis ~65]
  B2 barrier(x[src] * w) (multiply inside fusion)
  C  gather only, barriered, summed                  [expect ~50]
  D  segsum only on a precomputed message stream     [isolates reduce]
  E  multiply+segsum on precomputed stream           [D + 1 stream rt]
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

srcj = jnp.asarray(src.astype(np.int32))
dstj = jnp.asarray(dst.astype(np.int32))
wj = jnp.asarray(w)
x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))


def chain(body):
    @jax.jit
    def f(x):
        def step(xc, _):
            return body(xc), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out
    return f


def timed(name, body):
    f = chain(body)
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
    return per


def norm(y):
    # keep the carry bounded without touching the measured op's form
    return y / jnp.maximum(jnp.sqrt(jnp.mean(y * y)), 1e-6)


# A — current spmm_coo form
def case_a(x):
    msgs = x[srcj] * wj[:, None]
    return norm(jax.ops.segment_sum(msgs, dstj, num_segments=N,
                                    indices_are_sorted=True))


# B — barrier between gather and multiply
def case_b(x):
    msgs = jax.lax.optimization_barrier(x[srcj])
    msgs = msgs * wj[:, None]
    return norm(jax.ops.segment_sum(msgs, dstj, num_segments=N,
                                    indices_are_sorted=True))


# B2 — barrier after multiply
def case_b2(x):
    msgs = jax.lax.optimization_barrier(x[srcj] * wj[:, None])
    return norm(jax.ops.segment_sum(msgs, dstj, num_segments=N,
                                    indices_are_sorted=True))


# C — gather only (barriered), reduced to keep carry shape
def case_c(x):
    g = jax.lax.optimization_barrier(x[srcj])
    # cheap shape-restoring consume: strided slice sum (no segsum)
    return norm(x + g[:N])


# D — segsum only on a precomputed stream (stream regenerated from x
#     cheaply: broadcast of first row + per-edge weight — bandwidth-
#     equivalent to a real message stream, no gather)
def case_d(x):
    msgs = x[0][None, :] * wj[:, None]
    return norm(jax.ops.segment_sum(msgs, dstj, num_segments=N,
                                    indices_are_sorted=True))


if __name__ == "__main__":
    which = sys.argv[1:] or ["a", "b", "b2", "c", "d"]
    cases = {"a": ("A fused gather spmm", case_a),
             "b": ("B barrier(gather) spmm", case_b),
             "b2": ("B2 barrier(gather*w) spmm", case_b2),
             "c": ("C gather only (barrier)", case_c),
             "d": ("D segsum only (no gather)", case_d)}
    for k in which:
        name, body = cases[k]
        try:
            timed(name, body)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {ex}", flush=True)
