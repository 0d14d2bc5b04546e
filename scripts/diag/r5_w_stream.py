"""Round-5 probe: does a bf16 ELL weight stream move the SpMM?

The bench-shape kernel sits at 6.62 ns/edge vs the 6.0 gather-floor
ceiling; the gap is the idx/w streams + einsum.  Halving the w stream
(bf16 storage, f32-accumulated einsum) is the last cheap stream lever
(idx cannot shrink below int32 at >65k nodes).

Honest protocol: carry-dependent scan chain over the production
bucket layouts (ops/ell_spmm build), full output consumed.

Usage: python scripts/diag/r5_w_stream.py [nodes=500000] [edges=10000000]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.ops.ell_spmm import build_ell, ell_spmm

N = int(next((a[6:] for a in sys.argv[1:] if a.startswith("nodes=")),
             "500000"))
E = int(next((a[6:] for a in sys.argv[1:] if a.startswith("edges=")),
             "10000000"))
D, ITERS = 64, 8

rng = np.random.default_rng(0)
# zipf-ish dst degrees like the bench graph
dst = rng.zipf(1.3, size=E * 2) % N
dst = dst[:E].astype(np.int32)
src = rng.integers(0, N, size=E, dtype=np.int32)
w = rng.random(E, dtype=np.float32) * 0.1

t0 = time.time()
ell = build_ell(src, dst, w, N)
print(f"ELL build [{time.time()-t0:.0f}s] buckets="
      f"{[(int(i.shape[1]), int(i.shape[0])) for i in ell.idxs]}",
      flush=True)

x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))


def timed(fn, tag):
    @jax.jit
    def chain(x):
        def body(c, _):
            y = fn(c)
            # feed a slice back so every iteration depends on the last
            return c * 0.999 + y * 1e-6, y[0, 0]
        out, ys = jax.lax.scan(body, x, None, length=ITERS)
        return out.sum() + ys.sum()

    r = chain(x)
    float(r)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x))
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best*1e3:.1f} ms = {best/E*1e9:.2f} ns/edge", flush=True)
    return best


f32 = timed(lambda v: ell_spmm(ell, v), "f32 w (production)")

# bf16 weight storage, einsum still f32-accumulated via x.dtype cast
from dataclasses import replace
ell_bf16 = replace(ell, ws=tuple(w_.astype(jnp.bfloat16) for w_ in ell.ws))
bf = timed(lambda v: ell_spmm(ell_bf16, v), "bf16 w stream")
print(f"speedup {f32/bf:.3f}x", flush=True)
