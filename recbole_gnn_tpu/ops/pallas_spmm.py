"""Pallas TPU kernel: sorted-segment-sum SpMM over padded CSR blocks.

The sparse-path hot kernel (SURVEY.md §7.3 "SpMM speed-of-light").
XLA lowers segment-sum to a serial scatter on TPU (~22 GB/s measured);
this kernel exploits the dst-sorted edge layout instead:

  grid      = one program per block of BM destination rows
  edges     = the EC-aligned absolute chunks overlapping the block's
              edge range (host-built block_ptr, scalar-prefetched),
              streamed with double-buffered DMA
  reduction = ONE transposed-one-hot (BM, EC) @ (EC, D) MXU matmul per
              chunk/pass into a VMEM accumulator — no scatter anywhere

Edges of neighboring blocks inside boundary chunks mask themselves:
their dst_local falls outside [0, BM) so the one-hot row is zero.
msgs (= x[src]·w) are gathered by XLA outside the kernel (XLA's gather
is fine; its scatter is not).

Layout notes: per-matmul issue overhead dominates at small K, so each
chunk contracts in a single K=EC matmul; Mosaic cannot reshape
sublanes into lanes, so the HBM operands are laid out chunk-major —
msgs (E/EC, EC, D), dst (E/EC, 1, EC) — and every DMA slice lands
tile-aligned with no in-kernel reshapes.  Feature dim padded to 128
lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 64       # destination rows per program
EC = 2048    # edges per DMA chunk
SL = 128      # sublane grouping of the edge axis
ROWS = EC // SL


def build_block_ptr(dst_sorted: np.ndarray, n_nodes: int,
                    bm: int | None = None) -> np.ndarray:
    """block_ptr[i] = first edge index with dst >= i·bm (host-side,
    once per graph); length n_blocks+1."""
    if bm is None:
        bm = BM          # read the module global at call time
    n_blocks = -(-n_nodes // bm)
    bounds = np.arange(n_blocks + 1) * bm
    return np.searchsorted(dst_sorted, bounds).astype(np.int32)


def _spmm_kernel(block_ptr_ref, dst_ref, msgs_ref, out_ref,
                 acc_ref, chunk_buf, dst_buf, sems, dst_sems):
    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    block_base = i * BM
    # absolute EC-aligned chunk range overlapping [start, end)
    c0 = start // EC
    n_chunks = jnp.where(end > start, (end - 1) // EC - c0 + 1, 0)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def get_dma(slot, chunk_idx):
        c = c0 + chunk_idx
        return (
            pltpu.make_async_copy(
                msgs_ref.at[c], chunk_buf.at[slot], sems.at[slot]),
            pltpu.make_async_copy(
                dst_ref.at[c], dst_buf.at[slot], dst_sems.at[slot]),
        )

    @pl.when(n_chunks > 0)
    def _():
        for dma in get_dma(0, 0):
            dma.start()

        def body(c, carry):
            slot = c % 2
            nxt = (c + 1) % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in get_dma(nxt, c + 1):
                    dma.start()

            for dma in get_dma(slot, c):
                dma.wait()

            # transposed one-hot built directly as (BM, EC): one big-K
            # matmul per pass.  Out-of-block edges vanish (their
            # dst_local is outside [0, BM)).
            dst_row = dst_buf[slot]                     # (1, EC)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (BM, EC), 0)
                  == (dst_row - block_base)).astype(jnp.bfloat16)
            m = chunk_buf[slot]                         # (EC, dpad)
            # one-hot is exact in bf16 → 2-pass hi/lo split of the f32
            # messages gives f32-exact accumulation at bf16 MXU rate
            hi = m.astype(jnp.bfloat16)
            lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            total = acc_ref[:]
            for part in (hi, lo):
                total = total + jax.lax.dot_general(
                    oh, part,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[:] = total
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("n_nodes", "interpret"))
def _pallas_segment_sum(msgs: jax.Array, dst: jax.Array,
                        block_ptr: jax.Array, n_nodes: int,
                        interpret: bool = False) -> jax.Array:
    e, d = msgs.shape
    assert e % EC == 0, "edge count must be padded to a multiple of EC"
    dpad = -(-d // 128) * 128
    if dpad != d:
        # feature dim must be lane-aligned; callers avoid this copy by
        # padding x before the gather (see pallas_spmm)
        msgs = jnp.pad(msgs, ((0, 0), (0, dpad - d)))
    msgs3 = msgs.reshape(e // EC, EC, dpad)
    dst3 = dst.reshape(e // EC, 1, EC)
    n_blocks = -(-n_nodes // BM)
    n_pad = n_blocks * BM

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # block_ptr
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # dst3 (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # msgs3 (HBM)
        ],
        out_specs=pl.BlockSpec((BM, dpad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BM, dpad), jnp.float32),      # accumulator
            pltpu.VMEM((2, EC, dpad), jnp.float32),
            pltpu.VMEM((2, 1, EC), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _spmm_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, dpad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(block_ptr, dst3, msgs3)
    return out[:n_nodes, :d]


def pallas_spmm(src: jax.Array, dst: jax.Array, weight: jax.Array,
                x: jax.Array, n_nodes: int, block_ptr: jax.Array,
                interpret: bool = False) -> jax.Array:
    """out[d] = Σ_{e: dst[e]=d} w[e]·x[src[e]] — Pallas block kernel.

    Edges must be dst-sorted and padded to a multiple of EC with
    zero-weight edges (prepare_pallas_graph)."""
    d = x.shape[1]
    dpad = -(-d // 128) * 128
    if dpad != d:
        # pad the (N, d) table once — far cheaper than padding the
        # (E, d) message stream inside the kernel wrapper
        x = jnp.pad(x, ((0, 0), (0, dpad - d)))
    msgs = x[src] * weight[:, None].astype(x.dtype)
    out = _pallas_segment_sum(msgs.astype(jnp.float32), dst,
                              block_ptr, n_nodes, interpret)
    return out[:, :d]


def prepare_pallas_graph(src: np.ndarray, dst: np.ndarray,
                         weight: np.ndarray, n_nodes: int
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                    np.ndarray]:
    """Host prep: sort by dst, pad edge count to a multiple of EC with
    zero-weight self-edges on the last node, build block_ptr."""
    order = np.argsort(dst, kind="stable")
    src, dst, weight = src[order], dst[order], weight[order]
    e = len(src)
    e_pad = -(-e // EC) * EC
    if e_pad > e:
        pad = e_pad - e
        src = np.concatenate([src, np.full(pad, n_nodes - 1, src.dtype)])
        dst = np.concatenate([dst, np.full(pad, n_nodes - 1, dst.dtype)])
        weight = np.concatenate([weight, np.zeros(pad, weight.dtype)])
    block_ptr = build_block_ptr(dst, n_nodes)
    return (src.astype(np.int32), dst.astype(np.int32),
            weight.astype(np.float32), block_ptr)
