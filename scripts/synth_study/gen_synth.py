"""Structured synthetic dataset generator for the quality-parity study.

The 6k committed fixture (scripts/gen_fixture.py) draws items
independently of users, so it carries no collaborative signal — on it,
contrastive models sit at the noise floor and leaderboard ORDERING
cannot be checked (VERDICT r3 "What's missing" #1: the real ml-1m /
diginetica / lastfm datasets cannot be fetched in this environment).
This generator is the achievable substitute: an ml-100k-scale dataset
with *planted* structure along all three axes the reference's
leaderboards measure —

- collaborative: low-rank user x item affinity (latent factors), so
  BPR/LightGCN/NGCF-family learn and graph smoothing helps;
- sequential: first-order Markov transitions between items with
  similar factors, so session models (SRGNN family) beat
  non-sequential baselines;
- social: homophily edges between users with similar factors, so
  DiffNet/MHCN/SEPT have real signal in the .net file;
- popularity skew: zipf-ish item popularity, long-tail users — the
  regime where contrastive regularizers (SGL/SimGCL/NCL) earn their
  reference-leaderboard wins.

Everything is deterministic (fixed seed, numpy Generator).  Output is
the RecBole atomic-file format (<name>.inter + <name>.net) that
data/atomic.py reads; files are generated on demand (not committed —
~2.5 MB) into a caller-chosen directory.

Reference context: results/general/ml-1m.md:43-45 (6040 x 3629 x
836k), results/social/lastfm.md:48-50 (1892 x 17632 x 93k).
"""

from __future__ import annotations

import os

import numpy as np

SEED = 424242


def _softmax_gumbel_pick(logits: np.ndarray, rng: np.random.Generator
                         ) -> np.ndarray:
    """Row-wise sample from softmax(logits) via the Gumbel-max trick."""
    g = rng.gumbel(size=logits.shape)
    return np.argmax(logits + g, axis=1)


def generate(out_dir: str,
             name: str = "synth",
             n_users: int = 900,
             n_items: int = 1600,
             latent_dim: int = 16,
             mean_len: int = 100,
             beta_cf: float = 5.0,
             beta_seq: float = 3.0,
             pop_alpha: float = 0.7,
             net_deg: int = 8,
             seed: int = SEED) -> dict:
    """Generate <name>.inter and <name>.net under out_dir.

    Per-user sequences are simulated in parallel, one step at a time:
      logit_i = beta_cf * <u, v_i> + beta_seq * <v_prev, v_i>
                - pop_alpha * log(rank_i) - already_chosen * inf
    and the next item is a Gumbel-max softmax sample.  beta_cf plants
    the low-rank CF structure; beta_seq the Markov structure; the
    popularity term the zipf skew.  Timestamps strictly increase per
    user, so the sequential pipeline's time-ordering reproduces the
    generating chain.

    Returns summary stats (for logging / sanity tests).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    # latent factors, unit-ish scale
    U = rng.normal(size=(n_users, latent_dim)) / np.sqrt(latent_dim)
    V = rng.normal(size=(n_items, latent_dim)) / np.sqrt(latent_dim)
    # zipf popularity over a random item permutation (so popularity is
    # independent of the factor geometry)
    rank = rng.permutation(n_items) + 1
    pop_logit = -pop_alpha * np.log(rank)

    # per-user sequence lengths: lognormal-ish long tail, >= 12
    lens = np.maximum(12, rng.lognormal(np.log(mean_len), 0.6,
                                        size=n_users)).astype(int)
    max_len = int(lens.max())

    base = beta_cf * (U @ V.T) + pop_logit[None, :]  # (n_users, n_items)
    chosen = np.zeros((n_users, n_items), dtype=bool)
    prev = np.full(n_users, -1, dtype=int)
    seqs = [[] for _ in range(n_users)]
    for t in range(max_len):
        active = lens > t
        if not active.any():
            break
        logits = base[active].copy()
        pa = prev[active]
        has_prev = pa >= 0
        if has_prev.any():
            logits[has_prev] += beta_seq * (V[pa[has_prev]] @ V.T)
        logits[chosen[active]] = -1e30
        pick = _softmax_gumbel_pick(logits, rng)
        act_idx = np.nonzero(active)[0]
        chosen[act_idx, pick] = True
        prev[act_idx] = pick
        for ui, it in zip(act_idx, pick):
            seqs[ui].append(int(it))

    t0 = 880_000_000
    rows = []
    for u in range(n_users):
        gaps = rng.integers(60, 60_000, size=len(seqs[u]))
        times = t0 + np.cumsum(gaps)
        for it, ts in zip(seqs[u], times):
            # ratings carry no signal here (the reference leaderboards
            # threshold at >=3; keep everything above it)
            rows.append((u + 1, it + 1, int(rng.integers(3, 6)), int(ts)))

    inter_path = os.path.join(out_dir, f"{name}.inter")
    with open(inter_path, "w") as f:
        f.write("user_id:token\titem_id:token\trating:float\t"
                "timestamp:float\n")
        for u, it, r, ts in rows:
            f.write(f"{u}\t{it}\t{r}\t{ts}\n")

    # social net: per user, sample net_deg neighbors from
    # softmax(homophily) without self loops
    sim = U @ U.T
    np.fill_diagonal(sim, -1e30)
    net = set()
    for u in range(n_users):
        g = rng.gumbel(size=n_users)
        nbrs = np.argpartition(-(4.0 * sim[u] + g), net_deg)[:net_deg]
        for v in nbrs:
            net.add((u + 1, int(v) + 1))
    net_path = os.path.join(out_dir, f"{name}.net")
    with open(net_path, "w") as f:
        f.write("source_id:token\ttarget_id:token\n")
        for a, b in sorted(net):
            f.write(f"{a}\t{b}\n")

    return {
        "n_users": n_users, "n_items": n_items, "n_inter": len(rows),
        "n_net": len(net), "mean_len": float(np.mean(lens)),
        "max_len": max_len, "inter_path": inter_path,
        "net_path": net_path,
    }


def generate_sessions(out_dir: str,
                      name: str = "synthseq",
                      n_sessions: int = 30_000,
                      n_items: int = 2_000,
                      latent_dim: int = 16,
                      beta_seq: float = 8.0,
                      beta_intent: float = 4.0,
                      pop_alpha: float = 0.6,
                      seed: int = SEED + 1) -> dict:
    """Session-style dataset for the SEQUENTIAL family study.

    The general-study generator plants per-USER low-rank structure over
    long histories — the wrong regime for session recommenders, whose
    benchmarks (diginetica: ~5-item anonymous sessions) reward
    next-item transition structure.  Here each "user" is one short
    session (3–12 items): a seed item sets the session intent
    (z = v_seed), and each next item is a Gumbel-max sample of
      beta_seq * <v_prev, v_i> + beta_intent * <z, v_i>
      - pop_alpha * log(rank_i)
    without replacement.  Strong first-order Markov signal + intent
    coherence + zipf popularity — the structure SRGNN-family models
    are built to exploit.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    V = rng.normal(size=(n_items, latent_dim)) / np.sqrt(latent_dim)
    rank = rng.permutation(n_items) + 1
    pop_logit = -pop_alpha * np.log(rank)
    lens = rng.integers(3, 13, size=n_sessions)
    max_len = int(lens.max())

    # seed items by popularity
    g = rng.gumbel(size=(n_sessions, n_items))
    seed_items = np.argmax(pop_logit[None, :] + g, axis=1)
    prev = seed_items.copy()
    intent = V[seed_items]          # (S, d)
    chosen = np.zeros((n_sessions, n_items), dtype=bool)
    chosen[np.arange(n_sessions), seed_items] = True
    seqs = [[int(i)] for i in seed_items]
    for t in range(1, max_len):
        active = lens > t
        if not active.any():
            break
        logits = (beta_seq * (V[prev[active]] @ V.T)
                  + beta_intent * (intent[active] @ V.T)
                  + pop_logit[None, :])
        logits[chosen[active]] = -1e30
        pick = _softmax_gumbel_pick(logits, rng)
        act_idx = np.nonzero(active)[0]
        chosen[act_idx, pick] = True
        prev[act_idx] = pick
        for si, it in zip(act_idx, pick):
            seqs[si].append(int(it))

    t0 = 880_000_000
    inter_path = os.path.join(out_dir, f"{name}.inter")
    with open(inter_path, "w") as f:
        # sessions ride the user_id column (a session IS the "user" to
        # the sequential pipeline — no extra config keys needed)
        f.write("user_id:token\titem_id:token\ttimestamp:float\n")
        for s in range(n_sessions):
            times = t0 + np.cumsum(rng.integers(10, 600, size=len(seqs[s])))
            for it, ts in zip(seqs[s], times):
                f.write(f"{s + 1}\t{it + 1}\t{ts}\n")
    n_rows = int(lens.sum())
    return {"n_sessions": n_sessions, "n_items": n_items,
            "n_inter": n_rows, "inter_path": inter_path}


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/rgt_synth")
    ap.add_argument("--seed", type=int, default=SEED)
    args = ap.parse_args()
    stats = generate(args.out, seed=args.seed)
    print(stats)
