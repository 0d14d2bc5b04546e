"""Honest (carry-dependent) XLA row-gather bench: index ORDER effect.

Question: is a TPU row gather faster when indices are (nearly) sorted?
If yes, the streaming Pallas SpMM should lay edges out as
(dst_block, src)-sorted — the one-hot reduction does not need
intra-block dst order, so the gather pattern is free to choose.

Patterns (same index multiset each):
  random          — uniform shuffle (today's dst-sorted layout: src
                    random within each dst run)
  sorted          — globally non-decreasing (upper bound)
  blockG          — sorted within consecutive groups of G edges
                    (the (dst_block, src) layout; G ≈ edges per
                    dst-block = deg * BM)

Each timing threads the gather through a lax.scan carry (idx depends
on the previous sum) and consumes the full output — nothing can be
hoisted or DCE'd (see memory: round-2 artifact).  The per-iter time
includes one full-stream sum; identical across patterns, so the
DIFFERENCE isolates the gather pattern effect.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 8

CASES = [
    # (tag, n_rows, n_idx, dim)
    ("2M_d64", 200_000, 2_000_000, 64),
    ("12M_d64", 1_400_000, 12_000_000, 64),
    ("2M_d128", 200_000, 2_000_000, 128),
]


def patterns(rng, n_rows, n_idx):
    base = rng.integers(0, n_rows, n_idx).astype(np.int32)
    out = {"random": base}
    out["sorted"] = np.sort(base)
    for g in (8192, 131072):
        a = base.copy()
        for lo in range(0, n_idx, g):
            a[lo:lo + g] = np.sort(a[lo:lo + g])
        out[f"block{g//1024}k"] = a
    return out


def bench(table, idx):
    def chain(t, ix):
        def body(s, _):
            ix_eff = ix + jnp.minimum(s.astype(jnp.int32), 0)
            out = t.at[ix_eff].get(mode="promise_in_bounds")
            s2 = out.sum() * jnp.float32(1e-30) + jnp.float32(1.0)
            return jnp.minimum(s2, jnp.float32(2.0)), None
        s, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=ITERS)
        return s

    f = jax.jit(chain)
    t0 = time.perf_counter()
    float(f(table, idx))
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(table, idx))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / ITERS, compile_s


for tag, n_rows, n_idx, dim in CASES:
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(n_rows, dim)).astype(np.float32))
    for name, idx in patterns(rng, n_rows, n_idx).items():
        idxj = jnp.asarray(idx)
        per, comp = bench(table, idxj)
        ns_row = per / n_idx * 1e9
        gbs = n_idx * dim * 4 / per / 1e9
        print(f"{tag} {name:9s}: {per*1e3:7.2f} ms  {ns_row:5.2f} ns/row "
              f"{gbs:6.1f} GB/s(out)  [compile {comp:.0f}s]", flush=True)
