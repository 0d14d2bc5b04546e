"""North-star-scale structured dataset: 100k users x 1.3M items x 6M.

The round-4 gowalla_synth (scripts/diag/gowalla_scale_run.py) is
popularity-only — right for timing, useless for quality: nothing
personalized to learn, so converged NDCG just measures popularity
fitting.  This generator plants CLUSTER-STRUCTURED collaborative
signal at the full BASELINE.json config #5 shape with O(n_inter)
sampling (the synth-study low-rank generator materializes the
(n_users, n_items) logit matrix — 520 GB here, infeasible):

- items are randomly partitioned into C clusters;
- each user draws K preferred clusters with Dirichlet weights;
- each interaction picks one of the user's clusters w.p. p_cluster
  (else the global catalog), then an item within the chosen pool by
  a zipf-ish rank law (r = floor(size * u^gamma), u~U(0,1)).

Block low-rank structure of rank ~C: a d=64 embedding model can
represent it, an unpersonalized popularity ranker cannot — so the
gap (model NDCG) - (popularity NDCG) on the held-out split measures
collaborative signal actually learned at north-star scale.

Deterministic (seeded Generator).  Output: RecBole atomic format.
Reference context for the shape: BASELINE.json north_star / reference
README.md:10 (gowalla: 107k x 1.28M x 6.4M).
"""

from __future__ import annotations

import os

import numpy as np

SEED = 525252


def generate(out_dir: str,
             name: str = "northstar",
             n_users: int = 100_000,
             n_items: int = 1_300_000,
             n_inter: int = 6_000_000,
             n_clusters: int = 256,
             k_user: int = 4,
             p_cluster: float = 0.8,
             gamma: float = 3.0,
             cold_frac: float = 0.0,
             cold_n: int = 6,
             seed: int = SEED) -> dict:
    """``cold_frac`` > 0 makes users [0, cold_frac·n_users) COLD:
    exactly ``cold_n`` interactions each (the rest of the budget goes
    to the warm users) — the regime where graph propagation should
    beat pure MF (a cold user's embedding is estimated from ~4 train
    points; LightGCN additionally pools the neighborhoods of the items
    it shares with warm same-cluster users).  Cold membership is
    recoverable from the token: int(token) <= cold count."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.inter")
    if os.path.exists(path):
        return {"inter_path": path, "cached": True}

    # item -> cluster, contiguous pools after a random permutation
    perm = rng.permutation(n_items)
    bounds = np.linspace(0, n_items, n_clusters + 1).astype(np.int64)
    sizes = np.diff(bounds)

    # user -> K preferred clusters + Dirichlet mixture weights
    user_cl = rng.integers(0, n_clusters, size=(n_users, k_user))
    user_w = rng.dirichlet(np.full(k_user, 0.8), size=n_users)

    cdf = np.cumsum(user_w, axis=1)
    if cold_frac > 0:
        n_cold = int(n_users * cold_frac)
        n_warm = n_users - n_cold
        warm_total = n_inter - cold_n * n_cold
        counts = np.full(n_users, cold_n, dtype=np.int64)
        counts[n_cold:] = warm_total // n_warm
        counts[-1] += warm_total - (warm_total // n_warm) * n_warm
        users = np.repeat(np.arange(n_users), counts)
        m = len(users)
        slot = (rng.random(m)[:, None] > cdf[users]).sum(axis=1)
    else:
        per_user = n_inter // n_users
        users = np.repeat(np.arange(n_users), per_user)
        m = len(users)
        # choose the cluster slot per interaction from the user's mixture
        slot = (rng.random((n_users, per_user))[:, :, None]
                > cdf[:, None, :]).sum(axis=2).reshape(-1)
    cl = user_cl[users, slot]

    # zipf-ish rank within the chosen pool (cluster or global)
    u = rng.random(m)
    in_cluster = rng.random(m) < p_cluster
    r_cl = (sizes[cl] * u ** gamma).astype(np.int64)
    r_gl = (n_items * u ** gamma).astype(np.int64)
    pos = np.where(in_cluster, bounds[cl] + r_cl, r_gl)
    items = perm[pos]

    ts = 1_300_000_000 + rng.integers(0, 10 ** 7, size=m)
    order = np.argsort(users, kind="stable")

    with open(path, "w") as f:
        f.write("user_id:token\titem_id:token\ttimestamp:float\n")
        np.savetxt(f, np.column_stack([users[order] + 1,
                                       items[order] + 1,
                                       ts[order]]), fmt="%d",
                   delimiter="\t")
    return {"inter_path": path, "n_users": n_users, "n_items": n_items,
            "n_inter": m, "n_distinct_items": int(len(np.unique(items))),
            "cached": False}


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_data/northstar"
    print(generate(out))
