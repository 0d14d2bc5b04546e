"""Round-3 probe 5 — why does the gather double at gowalla scale?

Case R (r3_sparse_probe4.py) measured the 12M-edge production ELL
spmm at 15.1 ns/edge where the 10M-edge / 500k-node bench runs
7.1 ns/edge.  E_pad/E only explains 1.43/1.34; the rest must be the
gather itself costing more at N=1.4M than the 4.5 ns/row measured at
N=500k.  This probe isolates the gather:

  A  random idx, N in {500k, 1.4M}, f32 d=64
  B  SORTED idx at N=1.4M (perfect locality upper bound)
  C  block-local idx at N=1.4M (random within 64k-row windows —
     what host-side node clustering could realistically deliver)
  D  bf16 table at N=1.4M (half the gathered bytes)

Honest protocol: gather feeds the scan carry (reduced back to (N,D)
via a cheap slice-add), so XLA cannot hoist or elide it.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 8
E = 10_000_000
D = 64


def timed(name, f, x0, per_div):
    t0 = time.time()
    out = f(x0)
    float(jnp.asarray(out).ravel()[0])
    print(f"  [{name}] compiled+first in {time.time()-t0:.0f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x0)
        float(jnp.asarray(out).ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / ITERS
    print(f"{name:44s}: {per*1e3:8.2f} ms/iter  "
          f"({per/per_div*1e9:6.2f} ns/row)", flush=True)
    return per


def run(name, n_nodes, idx_np, dtype):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n_nodes, D)).astype(np.float32)
                     ).astype(dtype)
    idx = jnp.asarray(idx_np.astype(np.int32))

    @jax.jit
    def f(x):
        def step(xc, _):
            g = xc[idx]                       # (E, D) gather
            # consume EVERY gathered row into the carry (ADVICE r3:
            # a g[:n_nodes] slice folds into the gather and the probe
            # measures an n_nodes-row gather instead of E rows):
            # modular slice-accumulate = one extra pass over (E, D)
            k = g.shape[0] // n_nodes
            acc = jnp.zeros((n_nodes, g.shape[1]), g.dtype)
            for i in range(k):
                acc = acc + g[i * n_nodes:(i + 1) * n_nodes]
            rem = g.shape[0] - k * n_nodes
            if rem:
                acc = acc.at[:rem].add(g[k * n_nodes:])
            xc = xc + 1e-6 * acc.astype(xc.dtype)
            return xc, None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed(name, f, x0, E)


def main():
    rng = np.random.default_rng(7)
    which = set(sys.argv[1:] or ["a", "b", "c", "d"])

    if "a" in which:
        run("A1 random idx, N=500k, f32", 500_000,
            rng.integers(0, 500_000, E), jnp.float32)
        run("A2 random idx, N=1.4M, f32", 1_400_000,
            rng.integers(0, 1_400_000, E), jnp.float32)
    if "b" in which:
        run("B  sorted idx, N=1.4M, f32", 1_400_000,
            np.sort(rng.integers(0, 1_400_000, E)), jnp.float32)
    if "c" in which:
        # random within contiguous 64k-row windows, windows in order;
        # ceil window count w/ clipped tail so ALL rows are locally
        # targeted (ADVICE r3: floor left the last ~24k rows random)
        win = 65_536
        n_nodes = 1_400_000
        n_win = -(-n_nodes // win)
        per = E // n_win
        parts = [rng.integers(w * win, min((w + 1) * win, n_nodes), per)
                 for w in range(n_win)]
        idx = np.concatenate(parts)
        idx = np.concatenate([idx, rng.integers(0, n_nodes,
                                                E - len(idx))])
        run("C  64k-window-local idx, N=1.4M, f32", n_nodes,
            idx, jnp.float32)
    if "d" in which:
        run("D  random idx, N=1.4M, bf16", 1_400_000,
            rng.integers(0, 1_400_000, E), jnp.bfloat16)


if __name__ == "__main__":
    main()
