"""Is XLA sorted segment-sum the real SpMM fast path now?

Measures gather+segment_sum(sorted) at bench scale and gowalla scale,
d=64/128, plus the edge-chunked variant — decides whether spmm()
should default to the XLA path over the Pallas kernel.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 10


def bench(name, n, e, d, chunk=None):
    rng = np.random.default_rng(0)
    half = e // 2
    u = rng.integers(0, n // 2, half)
    i = rng.integers(n // 2, n, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    w = rng.normal(size=e).astype(np.float32)
    sj = jnp.asarray(src.astype(np.int32))
    dj = jnp.asarray(dst.astype(np.int32))
    wj = jnp.asarray(w)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    from recbole_gnn_tpu.ops.spmm import _spmm_coo_chunked

    def one(xc):
        if chunk:
            return _spmm_coo_chunked(sj, dj, wj, xc, n, True, chunk=chunk)
        msgs = xc[sj] * wj[:, None]
        return jax.ops.segment_sum(msgs, dj, num_segments=n,
                                   indices_are_sorted=True)

    @jax.jit
    def run(xc):
        def step(c, _):
            o = one(xc)
            return c + o[::997].sum(), None
        out, _ = jax.lax.scan(step, jnp.float32(0), None, length=ITERS)
        return out

    t0 = time.perf_counter()
    out = run(x)
    float(out)
    compile_t = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        float(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    print(f"{name:34s}: {per*1e3:8.3f} ms/spmm "
          f"({e/per/1e9:6.2f} Gedge/s)  [compile {compile_t:.0f}s]",
          flush=True)


bench("segsum n=200k e=2M d=64", 200_000, 2_000_000, 64)
bench("segsum n=200k e=2M d=128", 200_000, 2_000_000, 128)
bench("segsum n=9.7k e=2M d=64", 9_671, 2_000_000, 64)
bench("segsum gowalla 1.4M/12M d=64", 1_400_000, 12_000_000, 64)
bench("chunked gowalla d=64 (2M chunks)", 1_400_000, 12_000_000, 64,
      chunk=2_000_000)
