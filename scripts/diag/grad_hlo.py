"""Dump optimized HLO of the gowalla-scale grad step and summarize the
big fusions (what ops each ~168ms fusion contains)."""

import re
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.spmm import build_graph, spmm

N_U, N_I, N_INTER = 100_000, 1_300_000, 6_000_000
D, LAYERS, B = 64, 3, 4096

rng = np.random.default_rng(0)
users = rng.integers(1, N_U, N_INTER)
items = rng.integers(1, N_I, N_INTER)
n = N_U + N_I
src = np.concatenate([users, items + N_U])
dst = np.concatenate([items + N_U, users])
deg = np.bincount(dst, minlength=n).astype(np.float64)
dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
w = (dinv[src] * dinv[dst]).astype(np.float32)
graph = build_graph(src, dst, w, n, with_pallas=True)
print("graph built", flush=True)

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


def grad_step(p, g, b):
    loss, grads = jax.value_and_grad(loss_fn)(p, g, b)
    return loss, grads


lowered = jax.jit(grad_step).lower(params, graph, batch)
compiled = lowered.compile()
txt = compiled.as_text()
print(f"HLO text: {len(txt)} chars", flush=True)
with open("/tmp/grad_step_hlo.txt", "w") as f:
    f.write(txt)

# summarize each top-level fusion: name, kind, shapes, op kinds inside
for m in re.finditer(r"^\s*%?(fusion[.\w]*) = ([^\n]*)", txt, re.M):
    pass

# print fusion computation summaries
fusions = {}
cur = None
for line in txt.splitlines():
    mm = re.match(r"^%?(\S*fused_computation\S*) .*{", line.strip())
    if mm:
        cur = mm.group(1)
        fusions[cur] = []
        continue
    if cur is not None:
        if line.strip().startswith("}"):
            cur = None
            continue
        op = re.search(r"= \S+ (\w[\w-]*)\(", line)
        if op:
            fusions[cur].append(op.group(1))

interesting = ("scatter", "gather", "dynamic-update-slice", "while",
               "sort", "dynamic-slice")
for name, ops in fusions.items():
    hits = [o for o in ops if o in interesting]
    if hits:
        from collections import Counter
        print(name, dict(Counter(ops)))
