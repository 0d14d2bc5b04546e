"""Round-3 gowalla parity-batch step measurement (VERDICT r2 #4).

LightGCN at gowalla scale (100k users × 1.3M items, 6M interactions →
12M directed edges), B=4096, 3 layers, d=64 — the reference-parity
hyperparameters.  Measures, each as carry-dependent scan chains:

  1. production spmm forward (ELL path) — one layer
  2. full train step (fwd 3 layers + bwd 3 transpose ELLs + adam),
     scanned 8 steps per dispatch
  → steady-epoch estimate at 6M/4096 = 1465 steps

Optional arg `k4`: rebuild the ELL layouts allowing K=4 buckets
(k_align experiment — low-degree items dominate the padding at this
avg-degree-4.6 shape).
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
ITERS = 8
if "b65536" in sys.argv[1:]:   # MXU-friendly batch: 16x fewer steps
    B, ITERS = 65_536, 4
    print("(b65536: batch 65536, 92 steps/epoch)", flush=True)

rng = np.random.default_rng(0)
users = rng.integers(1, N_U, N_INTER)
items = rng.integers(1, N_I, N_INTER)
n = N_U + N_I
src = np.concatenate([users, items + N_U])
dst = np.concatenate([items + N_U, users])
deg = np.bincount(dst, minlength=n).astype(np.float64)
dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
w = (dinv[src] * dinv[dst]).astype(np.float32)

if "k4" in sys.argv[1:]:
    import recbole_gnn_tpu.ops.ell_spmm as _e
    _e._K_SMALL = 4
    print("(k4: sub-8 bucket enabled for deg<=4 nodes)", flush=True)
if "k8" in sys.argv[1:]:   # r4: _K_SMALL=4 is the default now; k8 = old
    import recbole_gnn_tpu.ops.ell_spmm as _e
    _e._K_SMALL = 0
    print("(k8: sub-8 bucket disabled)", flush=True)
if "k124" in sys.argv[1:]:  # r4: sub-8 ladder — more buckets, less pad
    import recbole_gnn_tpu.ops.ell_spmm as _e
    _e._K_SMALL = (1, 2, 4)
    print("(k124: sub-8 bucket ladder 1/2/4)", flush=True)
if "k1to7" in sys.argv[1:]:  # r4: full sub-8 ladder incl. odd widths
    import recbole_gnn_tpu.ops.ell_spmm as _e
    _e._K_SMALL = (1, 2, 3, 4, 5, 6, 7)
    print("(k1to7: full sub-8 ladder)", flush=True)
with_ell = True
if "xla" in sys.argv[1:]:  # like-for-like impl A/B on the SAME graph
    import recbole_gnn_tpu.ops.spmm as _s
    _s.SPMM_IMPL = "xla"
    with_ell = False
    print("(xla: sorted segment-sum path)", flush=True)

t0 = time.time()
graph = build_graph(src, dst, w, n, with_ell=with_ell)
if graph.ell is not None:
    print(f"graph+ell built [{time.time()-t0:.0f}s] "
          f"E_pad/E={graph.ell.e_padded/len(src):.3f} "
          f"buckets={[int(i.shape[1]) for i in graph.ell.idxs]}", flush=True)
else:
    print(f"graph built [{time.time()-t0:.0f}s] (no ELL)", flush=True)

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
params = {"user_emb": jax.random.normal(k1, (N_U, D)) * 0.1,
          "item_emb": jax.random.normal(k2, (N_I, D)) * 0.1}
optimizer = make_optimizer("adam", 1e-3)
opt_state = optimizer.init(params)


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


def make_batches(k):
    lo = np.arange(k)[:, None] * B % (N_INTER - B)
    idx = lo + np.arange(B)[None, :]
    return {"user": jnp.asarray(users[idx]), "pos": jnp.asarray(items[idx]),
            "neg": jnp.asarray(rng.integers(1, N_I, (k, B)))}


def fwd_only():
    x0 = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))

    @jax.jit
    def f(x):
        def step(xc, _):
            y = spmm(graph, xc)
            return y / jnp.maximum(jnp.sqrt(jnp.mean(y * y)), 1e-6), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    t0 = time.time()
    out = f(x0)
    float(out.ravel()[0])
    print(f"  [spmm fwd] compile+1st {time.time()-t0:.0f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x0)
        float(out.ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    print(f"spmm fwd: {per*1e3:.1f} ms ({per/12e6*1e9:.2f} ns/edge)",
          flush=True)


def full_step():
    global params, opt_state

    @jax.jit
    def run(params, opt_state, g, batches):
        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, g, batch)
            params, opt_state = optimizer.update(grads, opt_state, params)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), batches)
        return params, opt_state, losses[-1]

    batches = make_batches(ITERS)
    t0 = time.time()
    params, opt_state, loss = run(params, opt_state, graph, batches)
    float(loss)
    print(f"  [train step] compile+1st {time.time()-t0:.0f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = run(params, opt_state, graph, batches)
        float(loss)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    n_steps = N_INTER // B
    print(f"train step: {per*1e3:.0f} ms  →  steady epoch "
          f"({n_steps} steps) ≈ {per*n_steps:.0f} s", flush=True)


def mem_analysis():
    """Static HBM budget of the compiled train-step program
    (r4: `memory_stats()` is None over the axon tunnel, so peak HBM
    is reported from XLA's buffer assignment instead: arguments +
    outputs + transient temp)."""
    @jax.jit
    def run(params, opt_state, g, batches):
        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, g, batch)
            params, opt_state = optimizer.update(grads, opt_state, params)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), batches)
        return params, opt_state, losses[-1]

    batches = make_batches(ITERS)
    t0 = time.time()
    ma = run.lower(params, opt_state, graph, batches).compile() \
        .memory_analysis()
    gib = 2.0 ** 30
    print(f"  [mem] compiled in {time.time()-t0:.0f}s", flush=True)
    print(f"train-step HBM (XLA buffer assignment): "
          f"args {ma.argument_size_in_bytes/gib:.2f} GiB + "
          f"out {ma.output_size_in_bytes/gib:.2f} GiB "
          f"(aliased {ma.alias_size_in_bytes/gib:.2f}) + "
          f"temp {ma.temp_size_in_bytes/gib:.2f} GiB  →  peak ≈ "
          f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes + ma.temp_size_in_bytes)/gib:.2f} GiB",
          flush=True)


if __name__ == "__main__":
    if "mem" in sys.argv[1:]:
        mem_analysis()
    else:
        fwd_only()
        full_step()
