"""Where does the gowalla-scale full-sort eval go? (r4)

At the north-star shape the eval pass (100k users × 1.12M items,
B=256 → 392 batches, eval_scan 32) costs ~106-133 s — now 2-3× the
43.9 s training epoch.  Decompose one pass:

  A  score matmul only           (B, D) @ (D, n_items)
  B  + history mask + top-k      (masked_topk → grouped two-stage)
  C  full Evaluator pass         eval_scan 32, B=256 (prod default)
  D  full Evaluator pass         eval_scan 8,  B=1024 (4× fewer
                                 batches, same entries/dispatch)

Synthetic catalog matches gowalla_scale_run's touched-item count.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N_USERS, N_ITEMS, D = 100_000, 1_121_793, 64
N_EVAL = 100_000          # one pos row per user
ITERS = 4


def timed(name, f, per_div=1):
    t0 = time.time()
    out = f()
    jax.tree_util.tree_map(
        lambda a: float(np.asarray(a).ravel()[0]) if hasattr(a, "ravel")
        else a, out)
    print(f"  [{name}] compile+1st {time.time()-t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        jax.tree_util.tree_map(
            lambda a: float(np.asarray(a).ravel()[0])
            if hasattr(a, "ravel") else a, out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best/per_div*1e3:.1f} ms", flush=True)
    return best / per_div


def main():
    from recbole_gnn_tpu.ops.topk import masked_topk, NEG_INF

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    ua = jax.random.normal(key, (N_USERS, D), jnp.float32)
    ia = jax.random.normal(jax.random.PRNGKey(1), (N_ITEMS, D),
                           jnp.float32)

    for B in (256, 1024):
        users = jnp.asarray(rng.integers(0, N_USERS, B))
        hist = jnp.asarray(rng.integers(0, N_ITEMS, (B, 64)))

        @jax.jit
        def score_only(ua, ia):
            def body(c, _):
                s = jnp.dot(ua[users], ia.T,
                            preferred_element_type=jnp.float32)
                return c + jnp.sum(s[:, :1]), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=ITERS)
            return acc

        @jax.jit
        def score_topk(ua, ia):
            def body(c, _):
                s = jnp.dot(ua[users], ia.T,
                            preferred_element_type=jnp.float32)
                rows = jnp.arange(B)[:, None]
                m = jnp.zeros(s.shape, bool).at[rows, hist].set(True)
                s = jnp.where(m, NEG_INF, s)
                _, idx = masked_topk(s, 10)
                return c + jnp.sum(idx[:, :1]), None
            acc, _ = jax.lax.scan(body, jnp.int64(0) if False else 0.0,
                                  None, length=ITERS)
            return acc

        a = timed(f"A score matmul B={B}", lambda: score_only(ua, ia),
                  ITERS)
        b = timed(f"B +mask+topk B={B}", lambda: score_topk(ua, ia),
                  ITERS)
        n_batches = -(-N_EVAL // B)
        print(f"B={B}: per-batch {b*1e3:.1f} ms → {n_batches} batches "
              f"≈ {b*n_batches:.1f} s compute floor", flush=True)


if __name__ == "__main__":
    main()
