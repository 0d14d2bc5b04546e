"""Honest (carry-dependent) microbenchmarks of the SpMM primitives.

Every chain threads the measured op through the lax.scan carry so XLA
cannot hoist it (the round-2 segsum numbers were 10x flattered by
loop-invariant hoisting — see memory tpu-xla-segsum-fast).

Measures, at gowalla scale (N=1.4M nodes, E=12M edges):
  g64f   gather (E,) random rows from (N,64) f32
  g128f  gather random rows from (N,128) f32
  g128b  gather random rows from (N,128) bf16
  gsort  gather SORTED indices from (N,128) f32 (the 'expand')
  scat   sorted segment_sum of a pre-materialized (E,64) msgs stream
         (scatter side only, no gather)
  spmm   gather+segsum fused (the current XLA path)

Usage: python scripts/diag/primitives_bench.py [which ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N = 1_400_000
E = 12_000_000
ITERS = 5

args = []
for a in sys.argv[1:]:
    if a.startswith("N="):
        N = int(a[2:])
    elif a.startswith("E="):
        E = int(a[2:])
    else:
        args.append(a)
which = set(args) or {"g64f", "g128f", "g128b", "gsort",
                      "scat", "spmm"}

rng = np.random.default_rng(0)
idx = rng.integers(0, N, E).astype(np.int32)
idx_sorted = np.sort(idx)
dst = np.sort(rng.integers(0, N, E).astype(np.int32))
idxj = jnp.asarray(idx)
idxsj = jnp.asarray(idx_sorted)
dstj = jnp.asarray(dst)


def timed(name, make_fn, *args, bytes_moved=None, rows=None):
    f = jax.jit(make_fn)
    t0 = time.perf_counter()
    out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    c = time.perf_counter() - t0
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    extra = ""
    if bytes_moved:
        extra += f"  {bytes_moved/per/1e9:7.1f} GB/s"
    if rows:
        extra += f"  {per/rows*1e9:6.2f} ns/row"
    print(f"{name:7s}: {per*1e3:8.1f} ms/iter{extra}", flush=True)


def chain(op, x0):
    """dependent chain: op's output perturbs the carry table."""
    def run(x):
        def body(xc, _):
            o = op(xc)
            # fold a cheap reduction of o back into the carry
            return xc * 0.999 + o.sum() * 1e-20, o[0, 0]
        xo, outs = jax.lax.scan(body, x, None, length=ITERS)
        return xo.ravel()[0] + outs.sum()
    return run


if "g64f" in which:
    x = jnp.asarray(rng.normal(size=(N, 64)), jnp.float32)
    timed("g64f", chain(lambda xc: xc.at[idxj].get(
        mode="promise_in_bounds"), x), x,
        bytes_moved=E * 64 * 4, rows=E)

if "g128f" in which:
    x = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
    timed("g128f", chain(lambda xc: xc.at[idxj].get(
        mode="promise_in_bounds"), x), x,
        bytes_moved=E * 128 * 4, rows=E)

if "g128b" in which:
    x = jnp.asarray(rng.normal(size=(N, 128)), jnp.bfloat16)
    timed("g128b", chain(lambda xc: xc.at[idxj].get(
        mode="promise_in_bounds"), x), x,
        bytes_moved=E * 128 * 2, rows=E)

if "gsort" in which:
    x = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
    timed("gsort", chain(lambda xc: xc.at[idxsj].get(
        mode="promise_in_bounds", indices_are_sorted=True), x), x,
        bytes_moved=E * 128 * 4, rows=E)

if "scat" in which:
    m = jnp.asarray(rng.normal(size=(E, 64)), jnp.float32)
    timed("scat", chain(lambda mc: jax.ops.segment_sum(
        mc, dstj, num_segments=N, indices_are_sorted=True), m), m,
        bytes_moved=E * 64 * 4, rows=E)

if "spmm" in which:
    x = jnp.asarray(rng.normal(size=(N, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E,)), jnp.float32)

    def op(xc):
        msgs = xc.at[idxj].get(mode="promise_in_bounds") * w[:, None]
        return jax.ops.segment_sum(msgs, dstj, num_segments=N,
                                   indices_are_sorted=True)
    timed("spmm", chain(op, x), x, bytes_moved=E * 64 * 4 * 2, rows=E)
