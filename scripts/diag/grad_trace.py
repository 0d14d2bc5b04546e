"""Trace the gowalla-scale LightGCN fwd+bwd step and print top TPU ops.

The round-2 breakdown (sparse_step_breakdown.py) showed fwd-only 55 ms
but fwd+bwd 1050 ms — this aggregates XLA op durations from a profiler
trace of the value_and_grad chain to locate the backward hotspot.

Usage: python scripts/diag/grad_trace.py [mode]
  mode = grad (default) | fwd
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.spmm import build_graph, spmm
from recbole_gnn_tpu.train.optim import make_optimizer

MODE = sys.argv[1] if len(sys.argv) > 1 else "grad"
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
print(f"graph built [{time.time()-t0:.0f}s]", flush=True)

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
params = {"user_emb": jax.random.normal(k1, (N_U, D)) * 0.1,
          "item_emb": jax.random.normal(k2, (N_I, D)) * 0.1}

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


def fwd_chain(p, g, b):
    def body(c, _):
        return c + loss_fn(p, g, b), None
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return out


def grad_chain(p, g, b):
    def body(carry, _):
        p_ = carry
        loss, grads = jax.value_and_grad(loss_fn)(p_, g, b)
        p_ = jax.tree_util.tree_map(lambda a, gr: a - 0.0 * gr, p_, grads)
        return p_, loss
    p_out, losses = jax.lax.scan(body, p, None, length=ITERS)
    return losses


fn = jax.jit(grad_chain if MODE == "grad" else fwd_chain)
t0 = time.perf_counter()
out = fn(params, graph, batch)
float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
print(f"compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
out = fn(params, graph, batch)
float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
print(f"{(time.perf_counter()-t0)/ITERS*1e3:.1f} ms/iter", flush=True)

trace_dir = "/tmp/grad_trace"
with jax.profiler.trace(trace_dir):
    out = fn(params, graph, batch)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])

files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
if not files:
    print("no trace file found under", trace_dir)
    sys.exit(0)
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)

pid_names = {ev.get("pid"): ev.get("args", {}).get("name", "")
             for ev in trace["traceEvents"]
             if ev.get("ph") == "M" and ev.get("name") == "process_name"}
agg = defaultdict(float)
cnt = defaultdict(int)
for ev in trace["traceEvents"]:
    if ev.get("ph") != "X":
        continue
    pname = pid_names.get(ev.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    name = ev.get("name", "?")
    agg[name] += ev.get("dur", 0) / 1e3
    cnt[name] += 1
total = sum(agg.values())
print(f"\ndevice total {total:.1f} ms over {ITERS} iters "
      f"({total/ITERS:.2f} ms/iter attributed)")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{ms:9.2f} ms  x{cnt[name]:<5d} {name[:100]}")
