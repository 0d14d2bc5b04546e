"""LESSR EOPA A/B at diginetica scale (VERDICT r3 #5).

A: round-3 per-edge-position scan (L-1 sequential steps, each a (B,)
   GRU + (B,L,D) one-hot state blend) — inlined below.
B: round-4 mailbox scan (K = max in-degree sequential steps, each a
   (B,L,D)-wide GRU) — models/sequential/lessr.py.

Also times one full-sort eval pass (B × 29454-item catalog) per
variant.  Synthetic diginetica-shaped sessions: 29454 items, L=20,
length distribution ~ observed (mean ≈ 5), 15% repeat-visit rate.
Honest protocol: jitted train step scanned ITERS times with the params
carry; timing forced by a scalar read.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.config import Config
from recbole_gnn_tpu.data.session import build_lessr_graphs
from recbole_gnn_tpu.models.layers import gru_step
from recbole_gnn_tpu.models.init import linear
from recbole_gnn_tpu.models.sequential.lessr import LESSR, _prelu
from recbole_gnn_tpu.train.optim import make_optimizer

N_ITEMS, L, B, ITERS = 29_454, 20, 2048, 4


def synth_batch(rng, B):
    lens = np.clip(rng.geometric(0.25, B) + 1, 2, L)
    seqs = np.zeros((B, L), np.int64)
    for i in range(B):  # small B: per-row loop is fine host-side
        n = lens[i]
        s = rng.integers(1, N_ITEMS, n)
        rep = rng.random(n) < 0.15  # revisit earlier item
        for j in range(1, n):
            if rep[j]:
                s[j] = s[rng.integers(0, j)]
        seqs[i, :n] = s
    graphs, _ = build_lessr_graphs(seqs, lens.astype(np.int64), L)
    batch = {k: jnp.asarray(v) for k, v in graphs.items()}
    batch["item_seq_len"] = jnp.asarray(lens.astype(np.int64))
    batch["item_id"] = jnp.asarray(rng.integers(1, N_ITEMS, B))
    batch["weight"] = jnp.ones((B,), jnp.float32)
    print(f"  K (max in-degree) = {graphs['eop_mail'].shape[2]}", flush=True)
    return batch


def eopa_old(self, lp, feat, batch, nmask, rng, train):
    """Round-3 per-edge-position EOPA (for the A side of the A/B)."""
    B_, Lp, _ = feat.shape
    from recbole_gnn_tpu.models.sequential.lessr import _masked_bn
    if self.batch_norm:
        feat = _masked_bn(lp["bn"], feat, nmask)
    rng, dropped = self._dropout(rng, feat, train)
    eop_src, eop_dst, n_eop = batch["eop_src"], batch["eop_dst"], \
        batch["n_eop"]
    E = eop_src.shape[1]
    state0 = jnp.zeros_like(feat)

    def step(state, p):
        src = eop_src[:, p]
        dst = eop_dst[:, p]
        valid = (p < n_eop)
        msg = jnp.take_along_axis(dropped, src[:, None, None], axis=1)[:, 0]
        cur = jnp.take_along_axis(state, dst[:, None, None], axis=1)[:, 0]
        new = gru_step(lp["gru"], cur, msg)
        new = jnp.where(valid[:, None], new, cur)
        oh = jax.nn.one_hot(dst, Lp, dtype=state.dtype)[:, :, None]
        state = state * (1.0 - oh) + new[:, None, :] * oh
        return state, None

    neigh, _ = jax.lax.scan(step, state0, jnp.arange(E))
    out = linear(lp["fc_self"], feat) + linear(lp["fc_neigh"], neigh)
    return rng, _prelu(lp["prelu"], out)


class DS:
    n_users, n_items, inter_num = 1, N_ITEMS, B


def run(tag, model, params, batch):
    optimizer = make_optimizer("adam", 1e-3)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def train_chain(params, opt_state, batch):
        def step(carry, _):
            p, s = carry
            def loss_fn(p):
                l, _ = model.calculate_loss(p, {}, {}, batch, key)
                return l
            loss, grads = jax.value_and_grad(loss_fn)(p)
            p, s = optimizer.update(grads, s, p)
            return (p, s), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=ITERS)
        return params, opt_state, losses[-1]

    @jax.jit
    def eval_chain(params, batch):
        def step(acc, _):
            sc = model.full_scores(params, {}, {}, batch, key, False)
            return acc + jnp.sum(sc[:, :1]), None
        acc, _ = jax.lax.scan(step, 0.0, None, length=ITERS)
        return acc

    t0 = time.time()
    params, opt_state, loss = train_chain(params, opt_state, batch)
    float(loss)
    print(f"  [{tag} train] compile+1st {time.time()-t0:.0f}s "
          f"loss={float(loss):.3f}", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = train_chain(params, opt_state, batch)
        float(loss)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag} train step: {best/ITERS*1e3:.1f} ms (B={B})", flush=True)

    t0 = time.time()
    float(eval_chain(params, batch))
    print(f"  [{tag} eval] compile+1st {time.time()-t0:.0f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(eval_chain(params, batch))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag} eval fwd: {best/ITERS*1e3:.1f} ms (B={B})", flush=True)
    return params


if __name__ == "__main__":
    cfg = Config(model="LESSR", dataset="synthetic",
                 config_dict={"data_path": "/nonexistent",
                              "embedding_size": 64, "n_layers": 4})
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, B)
    model = LESSR(cfg, DS())
    params = model.init_params(jax.random.PRNGKey(0))

    variants = sys.argv[1:] or ["new", "old"]
    for v in variants:
        if v == "old":
            LESSR._eopa = eopa_old
        run(v, model, params, batch)


def run_ablation():
    """Where does the LESSR step go? Time the train step with EOPA or
    SGAT layers replaced by a cheap linear of the same output width."""
    from recbole_gnn_tpu.models.init import linear as _lin

    cfg = Config(model="LESSR", dataset="synthetic",
                 config_dict={"data_path": "/nonexistent",
                              "embedding_size": 64, "n_layers": 4})
    rng = np.random.default_rng(0)
    batch = synth_batch(rng, B)
    model = LESSR(cfg, DS())
    params = model.init_params(jax.random.PRNGKey(0))

    real_eopa, real_sgat = LESSR._eopa, LESSR._sgat

    def stub_eopa(self, lp, feat, batch_, nmask, rng_, train):
        return rng_, _prelu(lp["prelu"], _lin(lp["fc_self"], feat))

    def stub_sgat(self, lp, feat, batch_, nmask, rng_, train):
        return rng_, _prelu(lp["prelu"], _lin(lp["fc_v"], feat))

    for tag, eopa, sgat in (("no-eopa", stub_eopa, real_sgat),
                            ("no-sgat", real_eopa, stub_sgat),
                            ("neither", stub_eopa, stub_sgat)):
        LESSR._eopa, LESSR._sgat = eopa, sgat
        run(tag, model, params, batch)
    LESSR._eopa, LESSR._sgat = real_eopa, real_sgat


if __name__ == "__main__" and "ablate" in sys.argv[1:]:
    run_ablation()
