"""Isolate the XLA row-gather rate on TPU — the suspected SpMM floor.

Times, for 2M random row indices into a (200k, D) table:
  1. plain gather x[idx]
  2. gather + weight multiply (the spmm message build)
  3. gather from a bf16 table
  4. sorted-index gather (dst-sorted locality)
  5. jnp.take along axis 0
Each as a scan chain of ITERS to amortize dispatch.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N, E, D = 200_000, 2_000_000, 128
ITERS = 10

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
idx_sorted = jnp.sort(idx)
w = jnp.asarray(rng.normal(size=E).astype(np.float32))
x32 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
x16 = x32.astype(jnp.bfloat16)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    float(jnp.asarray(out).ravel()[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.asarray(out).ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    rows_per_s = E / per
    print(f"{name:28s}: {per*1e3:8.3f} ms  ({rows_per_s/1e6:7.1f} M rows/s, "
          f"{E*args[0].dtype.itemsize*D/per/1e9 if hasattr(args[0],'dtype') else 0:.0f} GB/s)",
          flush=True)


def chain(body):
    # w passed as an argument — closure-captured arrays bake into the
    # HLO as constants (CLAUDE.md: stalls compile / folds)
    def run(x, i, ww):
        def step(c, _):
            g = body(x, i, ww)
            # fold the gather result back so iterations are dependent
            return c + g[::977].sum(), None
        out, _ = jax.lax.scan(step, jnp.float32(0), None, length=ITERS)
        return out
    return run


t0 = time.perf_counter()
timed("gather f32", chain(lambda x, i, ww: x[i]), x32, idx, w)
timed("gather f32 + w mul", chain(lambda x, i, ww: x[i] * ww[:, None]),
      x32, idx, w)
timed("gather bf16", chain(lambda x, i, ww: x[i].astype(jnp.float32)),
      x16, idx, w)
timed("gather f32 sorted idx", chain(lambda x, i, ww: x[i]),
      x32, idx_sorted, w)
timed("take axis0", chain(lambda x, i, ww: jnp.take(x, i, axis=0)),
      x32, idx, w)
# segment_sum for comparison (the full XLA spmm)
timed("gather+segsum sorted",
      chain(lambda x, i, ww: jax.ops.segment_sum(
          x[i] * ww[:, None], i, num_segments=N, indices_are_sorted=True)),
      x32, idx_sorted, w)
print(f"total {time.perf_counter()-t0:.0f}s", flush=True)
