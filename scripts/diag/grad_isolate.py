"""Isolate WHY the gowalla-scale SpMM runs ~168ms inside grad programs
vs ~20ms standalone.  Times, each as a 10-iter dependent chain:

  a) pure fwd spmm chain                       (expect ~20ms/spmm)
  b) fwd + manual transpose spmm (no autodiff) (expect ~40ms/iter)
  c) grad of sum(spmm(g,x)·c) — 1 layer        (isolates custom VJP)
  d) grad of 3-layer mean-pooled sum           (adds residual pressure)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.ops.spmm import build_graph, spmm, spmm_coo

N_U, N_I, N_INTER = 100_000, 1_300_000, 6_000_000
D = 64
ITERS = 10

rng = np.random.default_rng(0)
users = rng.integers(1, N_U, N_INTER)
items = rng.integers(1, N_I, N_INTER)
n = N_U + N_I
src = np.concatenate([users, items + N_U])
dst = np.concatenate([items + N_U, users])
deg = np.bincount(dst, minlength=n).astype(np.float64)
dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
w = (dinv[src] * dinv[dst]).astype(np.float32)
t0 = time.time()
graph = build_graph(src, dst, w, n, with_pallas=True)
print(f"graph built [{time.time()-t0:.0f}s]", flush=True)

x0 = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
c0 = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)


def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best/ITERS*1e3:8.1f} ms/iter  (compile {c:.0f}s)",
          flush=True)


def fwd_chain(x):
    def body(xc, _):
        return spmm(graph, xc), None
    out, _ = jax.lax.scan(body, x, None, length=ITERS)
    return out


def fwd_bwd_manual(x):
    rw = graph.weight[graph.rev_edge_id]

    def body(xc, _):
        h = spmm(graph, xc)
        g = spmm_coo(graph.rev_src, graph.rev_dst, rw, h, n)
        return g, None
    out, _ = jax.lax.scan(body, x, None, length=ITERS)
    return out


def grad1_chain(x):
    def loss(xc):
        return jnp.vdot(spmm(graph, xc), c0)

    def body(xc, _):
        g = jax.grad(loss)(xc)
        return xc - 0.0 * g + 1e-9 * g, None
    out, _ = jax.lax.scan(body, x, None, length=ITERS)
    return out


def grad3_chain(x):
    def loss(xc):
        layers = [xc]
        h = xc
        for _ in range(3):
            h = spmm(graph, h)
            layers.append(h)
        return jnp.vdot(jnp.mean(jnp.stack(layers, 0), 0), c0)

    def body(xc, _):
        g = jax.grad(loss)(xc)
        return xc + 1e-9 * g, None
    out, _ = jax.lax.scan(body, x, None, length=ITERS)
    return out


timed("a fwd        (1 spmm/iter)", fwd_chain, x0)
timed("b fwd+tspmm  (2 spmm/iter)", fwd_bwd_manual, x0)
timed("c grad 1-lyr (2 spmm/iter)", grad1_chain, x0)
timed("d grad 3-lyr (6 spmm/iter)", grad3_chain, x0)
