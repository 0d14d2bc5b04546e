"""Round-3 dense-path probe: can bf16 operands raise the dense driver
metric?  The dense step runs f32 MXU matmuls (~98 TFLOP/s peak on
v5e); bf16 peak is ~197.  Round-2 noted "1.7 ms with bf16 adjacency
per-step" — SLOWER than f32's 0.93 ms, which smells like a
mixed-precision lowering penalty rather than a hardware truth.  This
probes the bench step with (a) f32 A / f32 x (baseline), (b) bf16 A /
f32 x (mixed), (c) bf16 A / bf16 x with f32 accumulation
(preferred_element_type) — the MXU-native mode.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N_U, N_I, N_INTER = 6_041, 3_630, 1_000_000
D, LAYERS, B, STEPS = 64, 3, 4096, 60

rng = np.random.default_rng(0)
users = rng.integers(1, N_U, N_INTER).astype(np.int64)
items = rng.integers(1, N_I, N_INTER).astype(np.int64)
n = N_U + N_I
src = np.concatenate([users, items + N_U])
dst = np.concatenate([items + N_U, users])
deg = np.bincount(dst, minlength=n).astype(np.float64)
dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
w = dinv[src] * dinv[dst]
a_np = np.zeros((N_U, N_I), np.float32)
np.add.at(a_np, (users, items), w[:N_INTER])

from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.train.optim import make_optimizer

optimizer = make_optimizer("adam", 1e-3)


def run(tag, a_dtype, x_dtype):
    a = jnp.asarray(a_np, a_dtype)

    def propagate(p):
        xu = p["user_emb"].astype(x_dtype)
        xi = p["item_emb"].astype(x_dtype)
        layers_u, layers_i = [xu.astype(jnp.float32)], [xi.astype(jnp.float32)]
        for _ in range(LAYERS):
            nu = jnp.dot(a, xi, preferred_element_type=jnp.float32)
            ni = jnp.dot(a.T, xu, preferred_element_type=jnp.float32)
            layers_u.append(nu)
            layers_i.append(ni)
            xu, xi = nu.astype(x_dtype), ni.astype(x_dtype)
        return (jnp.mean(jnp.stack(layers_u), 0),
                jnp.mean(jnp.stack(layers_i), 0))

    def loss_fn(p, b):
        u, i = propagate(p)
        ue = u[b["user"]]
        pos = jnp.sum(ue * i[b["pos"]], -1)
        neg = jnp.sum(ue * i[b["neg"]], -1)
        reg = emb_loss([p["user_emb"][b["user"]], p["item_emb"][b["pos"]],
                        p["item_emb"][b["neg"]]], B, require_pow=True)
        return bpr_loss(pos, neg) + 1e-5 * reg

    @jax.jit
    def window(params, opt_state, batches):
        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            params, opt_state = optimizer.update(grads, opt_state, params)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), batches)
        return params, opt_state, losses[-1]

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {"user_emb": jax.random.normal(k1, (N_U, D)) * 0.1,
              "item_emb": jax.random.normal(k2, (N_I, D)) * 0.1}
    opt_state = optimizer.init(params)
    lo = np.arange(STEPS)[:, None] * B % (N_INTER - B)
    idx = lo + np.arange(B)[None, :]
    batches = jax.device_put({
        "user": users[idx], "pos": items[idx],
        "neg": rng.integers(1, N_I, (STEPS, B))})

    t0 = time.time()
    params, opt_state, loss = window(params, opt_state, batches)
    float(loss)
    print(f"  [{tag}] compile+1st {time.time()-t0:.0f}s loss={float(loss):.4f}",
          flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = window(params, opt_state, batches)
        float(loss)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / STEPS
    eps = LAYERS * 2 * N_INTER / per
    print(f"{tag:28s}: {per*1e3:6.3f} ms/step  ({eps/1e9:.2f}e9 edge-feat/s)",
          flush=True)


if __name__ == "__main__":
    cases = {"f32": (jnp.float32, jnp.float32),
             "bf16A": (jnp.bfloat16, jnp.float32),
             "bf16both": (jnp.bfloat16, jnp.bfloat16)}
    for tag in (sys.argv[1:] or ["f32", "bf16both", "bf16A"]):
        try:
            run(tag, *cases[tag])
        except Exception as ex:
            print(f"{tag}: FAILED {type(ex).__name__}: {ex}", flush=True)
