"""Round-3 probe 4 — attack the 4.5 ns/row gather floor.

  P  ELL bucket-sum with promise_in_bounds gathers (skip clamp logic)
  Q  Pallas row-DMA gather microbench: per-row HBM→VMEM async copies,
     8-deep pipeline, idx in SMEM — is manual DMA issue faster or
     slower than XLA's ~4.5 ns/row gather?
  R  gowalla-scale (1.4M nodes / 12M edges) production spmm fwd
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 8


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
    print(f"{name:40s}: {per*1e3:8.2f} ms/iter  "
          f"({per/per_div*1e9:6.2f} ns/row)", flush=True)
    return per


def norm(y):
    return y / jnp.maximum(jnp.sqrt(jnp.mean(y * y)), 1e-6)


def case_p():
    N, E, D = 500_000, 10_000_000, 64
    rng = np.random.default_rng(1)
    half = E // 2
    u = rng.integers(0, 100_000, half)
    i = rng.integers(100_000, N, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    deg = np.bincount(dst, minlength=N).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    order = np.argsort(dst, kind="stable")
    from recbole_gnn_tpu.ops.ell_spmm import build_ell
    meta = build_ell(src[order], dst[order], w[order], N)
    x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    def spmm_pib(meta, x):
        outs = []
        for idx, ww in zip(meta.idxs, meta.ws):
            n_b, k = idx.shape
            g = x.at[idx.reshape(-1)].get(mode="promise_in_bounds")
            outs.append(jnp.einsum("nkd,nk->nd", g.reshape(n_b, k, D), ww))
        # r4 pool-gather combine (mirrors ell_spmm)
        pool = outs
        if meta.n_multi:
            vr = jnp.concatenate(outs, axis=0)
            msums = jax.ops.segment_sum(vr[meta.mgidx], meta.msegs,
                                        num_segments=meta.n_multi,
                                        indices_are_sorted=True)
            pool = [vr, msums]
        pool = pool + [jnp.zeros((1, D), x.dtype)]
        return jnp.concatenate(pool, axis=0)[meta.node_src]

    @jax.jit
    def f(x):
        def step(xc, _):
            return norm(spmm_pib(meta, xc)), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed("P ELL promise_in_bounds", f, x0, E)


def case_q():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, E, D = 500_000, 2_000_000, 128   # D=128: HBM row slices must be lane-aligned
    C = 2048          # rows per program
    PIPE = 8          # DMAs in flight
    rng = np.random.default_rng(2)
    idx = rng.integers(0, N, E).astype(np.int32)

    def kernel(idx_ref, x_ref, out_ref, sems):
        def get_dma(j):
            slot = j % PIPE
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(idx_ref[j], 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[slot])

        for j in range(PIPE):
            get_dma(j).start()

        def body(j, _):
            get_dma(j).wait()

            @pl.when(j + PIPE < C)
            def _():
                get_dma(j + PIPE).start()
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(E // C,),
        in_specs=[
            pl.BlockSpec((C,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
        ],
        out_specs=pl.BlockSpec((C, D), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((PIPE,))],
    )
    gather = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
        grid_spec=grid_spec,
    )

    x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    idxj = jnp.asarray(idx)

    @jax.jit
    def f(x):
        def step(xc, _):
            g = gather(idxj, xc)
            # consume + restore carry shape
            return norm(xc + g[:N]), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed("Q pallas row-DMA gather (2M rows)", f, x0, E)


def case_r():
    N, E, D = 1_400_000, 12_000_000, 64
    rng = np.random.default_rng(3)
    half = E // 2
    u = rng.integers(0, 100_000, half)
    i = rng.integers(100_000, N, half)
    src = np.concatenate([u, i])
    dst = np.concatenate([i, u])
    deg = np.bincount(dst, minlength=N).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    from recbole_gnn_tpu.ops.spmm import build_graph, spmm
    t0 = time.time()
    graph = build_graph(src, dst, w, N, with_ell=True)
    print(f"  gowalla graph+ell built in {time.time()-t0:.0f}s "
          f"(E_pad/E={graph.ell.e_padded/E:.3f})", flush=True)
    x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    @jax.jit
    def f(x):
        def step(xc, _):
            return norm(spmm(graph, xc)), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    timed("R gowalla 12M-edge production spmm", f, x0, E)


if __name__ == "__main__":
    for k in (sys.argv[1:] or ["p", "q", "r"]):
        try:
            {"p": case_p, "q": case_q, "r": case_r}[k]()
        except Exception as ex:
            print(f"{k}: FAILED {type(ex).__name__}: {ex}", flush=True)
