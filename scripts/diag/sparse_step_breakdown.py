"""Decompose the gowalla-scale sparse LightGCN step cost on TPU.

Times, each as a 10-iter scan chain: (a) forward loss only,
(b) value_and_grad, (c) full step with adam.  Differences isolate
forward SpMMs vs backward vs optimizer.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.spmm import build_graph, spmm
from recbole_gnn_tpu.train.optim import make_optimizer

N_U, N_I, N_INTER = 100_000, 1_300_000, 6_000_000
D, LAYERS, B = 64, 3, 4096
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
print(f"graph built+transferred [{time.time()-t0:.0f}s] "
      f"E_pad={graph.n_edges_padded}", flush=True)

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
params = {"user_emb": jax.random.normal(k1, (N_U, D)) * 0.1,
          "item_emb": jax.random.normal(k2, (N_I, D)) * 0.1}
optimizer = make_optimizer("adam", 1e-3)
opt_state = optimizer.init(params)

batch = {"user": jnp.asarray(users[:B]), "pos": jnp.asarray(items[:B]),
         "neg": jnp.asarray(rng.integers(1, N_I, B))}


def loss_fn(p, g, b):
    ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
    layers = [ego]
    h = ego
    for _ in range(LAYERS):
        h = spmm(g, h)
        layers.append(h)
    final = jnp.mean(jnp.stack(layers, 0), 0)
    u, i = final[:N_U], final[N_U:]
    ue = u[b["user"]]
    pos = jnp.sum(ue * i[b["pos"]], -1)
    neg = jnp.sum(ue * i[b["neg"]], -1)
    reg = emb_loss([p["user_emb"][b["user"]], p["item_emb"][b["pos"]],
                    p["item_emb"][b["neg"]]], B, require_pow=True)
    return bpr_loss(pos, neg) + 1e-5 * reg


def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    sync = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(sync).ravel()[0])
    print(f"{name}: compile+1st {time.perf_counter()-t0:.0f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        sync = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(sync).ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best/ITERS*1e3:8.1f} ms/iter", flush=True)


def fwd_chain(p, g, b):
    def body(c, _):
        return c + loss_fn(p, g, b), None
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return out


def grad_chain(p, g, b):
    def body(carry, _):
        p_ = carry
        loss, grads = jax.value_and_grad(loss_fn)(p_, g, b)
        # fold grads back so iterations are dependent
        p_ = jax.tree_util.tree_map(lambda a, gr: a - 0.0 * gr, p_, grads)
        return p_, loss
    p_out, losses = jax.lax.scan(body, p, None, length=ITERS)
    return losses


def step_chain(p, o, g, b):
    def body(carry, _):
        p_, o_ = carry
        loss, grads = jax.value_and_grad(loss_fn)(p_, g, b)
        p_, o_ = optimizer.update(grads, o_, p_)
        return (p_, o_), loss
    (p_, o_), losses = jax.lax.scan(body, (p, o), None, length=ITERS)
    return losses


timed("fwd-only ", fwd_chain, params, graph, batch)
timed("fwd+bwd  ", grad_chain, params, graph, batch)
timed("full step", step_chain, params, opt_state, graph, batch)
