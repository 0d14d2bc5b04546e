"""Diagnostic: pallas segment kernel floor — DMA-only vs 1-pass vs 2-pass."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import recbole_gnn_tpu.ops.pallas_spmm as P
BM, EC = 64, 2048
N, E, D = 9671, 2_000_000, 64

rng = np.random.default_rng(0)
src = rng.integers(0, N, E); dst = rng.integers(0, N, E)
w = rng.normal(size=E).astype(np.float32)
x = jax.random.normal(jax.random.PRNGKey(0), (N, D))
s, d_, w_, bp = map(jnp.asarray, P.prepare_pallas_graph(src, dst, w, N))
msgs = (x[s]*w_[:,None]).astype(jnp.float32)

def make_kernel(n_pass):
    def kern(block_ptr_ref, dst_ref, msgs_ref, out_ref, acc_ref, chunk_buf, dst_buf, sems, dst_sems):
        i = pl.program_id(0)
        start = block_ptr_ref[i]; end = block_ptr_ref[i+1]
        base = i*BM
        c0 = start // EC
        n_chunks = jnp.where(end > start, (end-1)//EC - c0 + 1, 0)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        def get_dma(slot, ci):
            c = c0+ci
            return (pltpu.make_async_copy(msgs_ref.at[c], chunk_buf.at[slot], sems.at[slot]),
                    pltpu.make_async_copy(dst_ref.at[c], dst_buf.at[slot], dst_sems.at[slot]))
        @pl.when(n_chunks > 0)
        def _():
            for dma in get_dma(0,0): dma.start()
            def body(c, carry):
                slot = c%2; nxt=(c+1)%2
                @pl.when(c+1 < n_chunks)
                def _():
                    for dma in get_dma(nxt, c+1): dma.start()
                for dma in get_dma(slot, c): dma.wait()
                dst_row = dst_buf[slot]
                oh = (jax.lax.broadcasted_iota(jnp.int32,(BM,EC),0) == (dst_row - base)).astype(jnp.bfloat16)
                m = chunk_buf[slot]
                if n_pass == 0:
                    acc_ref[:] += m[:BM] * oh[:, 0:1].astype(jnp.float32)
                elif n_pass == 1:
                    acc_ref[:] += jax.lax.dot_general(oh, m.astype(jnp.bfloat16),
                        dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=jnp.float32)
                else:
                    hi = m.astype(jnp.bfloat16); lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    t = acc_ref[:]
                    for part in (hi, lo):
                        t = t + jax.lax.dot_general(oh, part,
                            dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=jnp.float32)
                    acc_ref[:] = t
                return carry
            jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[:] = acc_ref[:]
    return kern

def run(n_pass):
    e = msgs.shape[0]; dpad = 128
    m2 = jnp.pad(msgs, ((0,0),(0,dpad-D))).reshape(e//EC, EC, dpad)
    d3 = d_.reshape(e//EC, 1, EC)
    n_blocks = -(-N//BM)
    gs = pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BM,dpad), lambda i,*_: (i,0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BM,dpad),jnp.float32), pltpu.VMEM((2,EC,dpad),jnp.float32),
                        pltpu.VMEM((2,1,EC),jnp.int32), pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))])
    f = jax.jit(lambda bp_, d3_, m2_: pl.pallas_call(make_kernel(n_pass),
        out_shape=jax.ShapeDtypeStruct((n_blocks*BM, dpad), jnp.float32), grid_spec=gs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96*1024*1024))(bp_, d3_, m2_))
    o = f(bp, d3, m2); float(o[0,0])
    t0=time.perf_counter()
    for _ in range(20): o = f(bp, d3, m2)
    float(o[0,0])
    print(f"passes={n_pass}: {(time.perf_counter()-t0)/20*1000:.2f} ms")

run(0)
run(1)
run(2)
