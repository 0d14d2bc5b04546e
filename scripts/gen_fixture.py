"""Generate the synthetic test fixture dataset (tests/test_data/test/).

A small ml-100k-shaped dataset (same *format* as the reference's
fixture — user_id/item_id/rating/timestamp .inter + source/target .net —
but synthetic data, deterministic seed).  Run once; the output is
committed so tests never regenerate it.
"""

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "test_data", "test")
N_USERS = 350
N_ITEMS = 1100
N_INTER = 6000
N_NET = 600
SEED = 7


def main():
    rng = np.random.default_rng(SEED)
    os.makedirs(OUT, exist_ok=True)

    # zipf-ish item popularity, every user gets >= 6 interactions
    item_pop = 1.0 / (np.arange(1, N_ITEMS + 1) ** 0.8)
    item_pop /= item_pop.sum()
    rows = []
    per_user = np.maximum(
        6, rng.poisson(N_INTER / N_USERS, size=N_USERS)).astype(int)
    t0 = 880000000
    for u in range(1, N_USERS + 1):
        k = per_user[u - 1]
        items = rng.choice(N_ITEMS, size=min(k, N_ITEMS), replace=False,
                           p=item_pop) + 1
        times = t0 + rng.integers(0, 10_000_000, size=len(items))
        for it, ts in zip(items, np.sort(times)):
            rating = int(rng.integers(1, 6))
            rows.append((u, it, rating, int(ts)))
    rng.shuffle(rows)
    rows = rows[:N_INTER] if len(rows) > N_INTER else rows

    with open(os.path.join(OUT, "test.inter"), "w") as f:
        f.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
        for u, it, r, ts in rows:
            f.write(f"{u}\t{it}\t{r}\t{ts}\n")

    # social net: random directed pairs among users that appear above
    used_users = sorted({r[0] for r in rows})
    net = set()
    while len(net) < N_NET:
        a, b = rng.choice(used_users, size=2, replace=False)
        net.add((int(a), int(b)))
    with open(os.path.join(OUT, "test.net"), "w") as f:
        f.write("source_id:token\ttarget_id:token\n")
        for a, b in sorted(net):
            f.write(f"{a}\t{b}\n")
    print(f"wrote {len(rows)} interactions, {len(net)} net edges to {OUT}")


if __name__ == "__main__":
    main()
