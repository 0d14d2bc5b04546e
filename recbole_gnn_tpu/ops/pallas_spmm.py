"""Pallas TPU kernel: streaming sorted-segment-sum SpMM.

TPU-native replacement for torch_sparse CUDA SpMM (reference:
recbole_gnn/model/layers.py:19-20), selectable via
``sparse_spmm_impl: pallas``.  Honest carry-dependent measurements
(v5e / jax 0.9, scripts/diag/{pallas_hw_check,primitives_bench}.py):
37 ms at 2M edges × dim 64 and 195 ms at gowalla scale (12M edges /
1.4M nodes) vs the XLA sorted-segment-sum path's 27.9 / 178 ms — so
the XLA path stays the default and this kernel is the selectable
hedge.  Both paths sit on the same ~14-16 ns/row
composite floor: the per-edge row gather, not stream bandwidth or the
reduction, is the bottleneck (halving stream bytes via the packed
mode changes nothing).  It exploits the dst-sorted edge layout:

  grid      = one program per block of BM destination rows
  edges     = the EC-aligned chunks overlapping the block's edge range
              (host-built block pointers, scalar-prefetched), streamed
              with double-buffered DMA
  reduction = transposed-one-hot (BM, EC) @ (EC, D) MXU matmuls into a
              VMEM accumulator — no scatter anywhere

Edges of neighboring blocks inside boundary chunks mask themselves:
their dst_local falls outside [0, BM) so the one-hot row is zero.

**Streaming (no scale cliff).**  The gathered message stream would be
E×dpad×4 bytes if materialized whole — 6 GB at gowalla scale, which is
what disqualified the round-1 kernel.  The edge list is instead split
host-side into equal segments of ≤ SEG_MAX edges; an XLA `lax.scan`
gathers one segment's messages at a time (bounded HBM) and the kernel
*accumulates* the segment's partial sums into the output in place
(``input_output_aliases``).  Partial segment sums add exactly, and the
TPU grid is sequential, so no atomics are needed.  A destination block
split across segments is finished over multiple scan steps; programs
whose block has no edges in the current segment pass the running value
through.

**Precision modes** (the gather + message stream is the bandwidth
floor — these trade stream bytes against exactness):

  * "f32x2" (default): f32 message stream (pre-multiplied by w
    outside), split hi/lo in-kernel, two bf16 passes — f32-exact, and
    measured fastest (the stream-width savings of "packed" buy
    nothing; see above).
  * "packed": the node table is packed as hi/lo bf16 planes
    side by side in lanes (d=64 → exactly 128 lanes, zero physical
    padding: TPU HBM layouts pad the minor dim to 128 lanes anyway, so
    a (N, 64) f32 row costs 512 B while the packed row costs 256 B
    carrying the same f32-grade information).  The per-edge w·x[src]
    product and its hi/lo re-split run on the XLA side, fused into the
    gather's consumer, so the kernel sees a ready (EC, 2·d64) bf16
    stream and does a SINGLE 0/1-one-hot bf16 MXU pass; the two output
    lane halves are added afterwards.  Error ~2⁻¹⁶ relative.  (An
    earlier variant split w hi/lo *inside* the kernel; Mosaic elided
    the lossy f32→bf16→f32 roundtrip, collapsing the lo plane to 0 —
    a ~2e-3 error on hardware that interpret mode could not reproduce.)
  * "bf16": single bf16 pass, half bytes, ~3 significant digits.

Layout notes: per-matmul issue overhead dominates at small K, so each
chunk contracts in a single K=EC matmul; Mosaic cannot reshape sublanes
into lanes, so the HBM operands are laid out chunk-major — msgs
(seg/EC, EC, D), dst/w (seg/EC, 1, EC) — and every DMA slice lands
tile-aligned with no in-kernel reshapes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 512           # destination rows per program
EC = 4096          # edges per DMA chunk
SEG_MAX = 1 << 20  # max edges gathered per streamed segment

# f32x2 is both the exact mode and the measured-fastest (v5e, post
# overrun fix: 37 ms vs packed 40 ms at 2M edges; 195 vs 214 ms at
# gowalla scale — halving stream bytes does not pay because the
# bottleneck is per-row gather cost, not stream bandwidth).
DEFAULT_PRECISION = "f32x2"


@jax.tree_util.register_pytree_node_class
@dataclass
class PallasMeta:
    """Per-direction segment/block metadata for the streaming kernel.

    Built once on host (build_pallas_meta); rides the Graph pytree.

    Attributes:
      bptr: (n_seg, max_blk+1) int32 — per segment, edge offsets
        *within the segment* of each touched destination block
        (clipped to [0, seg]); blocks beyond the segment's range
        degenerate to start == end (pass-through programs).
      blk_lo: (n_seg, 1) int32 — first destination block each segment
        touches (scalar-prefetched; offsets the out index_map).
      bm / ec / seg: static tile sizes the layout was built with.
      n_blocks: static — total destination blocks (out rows = n_blocks·bm).
    """

    bptr: jax.Array
    blk_lo: jax.Array
    bm: int
    ec: int
    seg: int
    n_blocks: int

    def tree_flatten(self):
        return ((self.bptr, self.blk_lo),
                (self.bm, self.ec, self.seg, self.n_blocks))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def n_seg(self) -> int:
        return self.bptr.shape[0]

    @property
    def max_blk(self) -> int:
        return self.bptr.shape[1] - 1


def segment_layout(e: int, ec: int | None = None,
                   seg_max: int | None = None) -> tuple[int, int]:
    """(n_seg, seg): smallest equal-size ec-aligned segmentation of an
    edge list of length e with seg <= seg_max (up to ec rounding)."""
    ec = ec or EC
    seg_max = max(seg_max or SEG_MAX, ec)
    e_ec = -(-max(e, 1) // ec) * ec
    n_seg = -(-e_ec // seg_max)
    seg = -(-e_ec // (n_seg * ec)) * ec
    return n_seg, seg


def pad_edges(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
              n_nodes: int, ec: int | None = None,
              seg_max: int | None = None
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort by dst and pad to the segment layout with weight-0 edges on
    the last destination row (keeps dst non-decreasing; src 0 is always
    a valid gather row even for rectangular graphs)."""
    order = np.argsort(dst, kind="stable")
    src, dst, weight = src[order], dst[order], weight[order]
    n_seg, seg = segment_layout(len(src), ec, seg_max)
    e_pad = n_seg * seg
    if e_pad > len(src):
        pad = e_pad - len(src)
        src = np.concatenate([src, np.zeros(pad, src.dtype)])
        dst = np.concatenate([dst, np.full(pad, n_nodes - 1, dst.dtype)])
        weight = np.concatenate([weight, np.zeros(pad, weight.dtype)])
    return (src.astype(np.int32), dst.astype(np.int32),
            weight.astype(np.float32))


def build_pallas_meta(dst_sorted: np.ndarray, n_nodes: int,
                      bm: int | None = None, ec: int | None = None,
                      seg_max: int | None = None) -> PallasMeta:
    """Host-side metadata; dst_sorted must already be padded to the
    segment layout (pad_edges)."""
    bm = bm or BM
    ec = ec or EC
    e = len(dst_sorted)
    n_seg, seg = segment_layout(e, ec, seg_max)
    assert n_seg * seg == e, "pad the edge list first (pad_edges)"
    n_blocks = -(-n_nodes // bm)
    bounds = np.arange(n_blocks + 1) * bm
    gptr = np.searchsorted(dst_sorted, bounds).astype(np.int64)
    seg_starts = np.arange(n_seg) * seg
    blk_lo = dst_sorted[seg_starts] // bm
    blk_hi = dst_sorted[seg_starts + seg - 1] // bm + 1
    max_blk = int((blk_hi - blk_lo).max())
    j = np.arange(max_blk + 1)
    idx = np.minimum(blk_lo[:, None] + j[None, :], n_blocks)
    bptr = np.clip(gptr[idx] - seg_starts[:, None], 0, seg)
    return PallasMeta(jnp.asarray(bptr.astype(np.int32)),
                      jnp.asarray(blk_lo[:, None].astype(np.int32)),
                      bm, ec, seg, n_blocks)


def prepare_pallas_graph(src: np.ndarray, dst: np.ndarray,
                         weight: np.ndarray, n_nodes: int
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                    PallasMeta]:
    """Host prep: dst-sort + pad + build streaming metadata."""
    src, dst, weight = pad_edges(src, dst, weight, n_nodes)
    meta = build_pallas_meta(dst, n_nodes)
    return src, dst, weight, meta


def _hi_lo(x_f32):
    """Split f32 into hi/lo bf16 planes (hi + lo ≈ x to ~2⁻¹⁶ rel).

    In-kernel variant: convert-based round-to-nearest split.  Mosaic
    compiles the converts literally, so this is safe INSIDE a Pallas
    kernel only.  On the XLA side use :func:`_hi_lo_bits` — XLA's
    ``allow_excess_precision`` simplification (on by default) elides
    the f32→bf16→f32 convert pair, collapsing the lo plane to zero.
    """
    hi = x_f32.astype(jnp.bfloat16)
    lo = (x_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _hi_lo_bits(x_f32):
    """Elision-proof hi/lo bf16 split for XLA-side code.

    bf16 is bit-identical to the top 16 bits of f32, so the hi plane is
    carved out with integer masking (truncation) — no f32→bf16→f32
    convert pair exists for XLA's allow-excess-precision pass to elide.
    ``hi.astype(f32)`` reconstructs exactly; lo keeps the next 8
    mantissa bits → combined ~2⁻¹⁶ relative error."""
    u = jax.lax.bitcast_convert_type(x_f32, jnp.uint32)
    hi_u = u & jnp.uint32(0xFFFF0000)
    hi_f = jax.lax.bitcast_convert_type(hi_u, jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = (x_f32 - hi_f).astype(jnp.bfloat16)
    return hi, lo


def _spmm_kernel(bm, ec, mode, blk_lo_ref, bptr_ref,
                 dst_ref, msgs_ref, prev_ref, out_ref,
                 acc_ref, chunk_buf, dst_buf,
                 sems, dst_sems):
    i = pl.program_id(0)
    start = bptr_ref[i]
    end = bptr_ref[i + 1]
    block_base = (blk_lo_ref[0] + i) * bm
    c0 = start // ec
    n_chunks = jnp.where(end > start, (end - 1) // ec - c0 + 1, 0)

    # accumulate this segment's contribution on top of the running out
    acc_ref[:] = prev_ref[:]

    def get_dma(slot, chunk_idx):
        c = c0 + chunk_idx
        return [
            pltpu.make_async_copy(
                msgs_ref.at[c], chunk_buf.at[slot], sems.at[slot]),
            pltpu.make_async_copy(
                dst_ref.at[c], dst_buf.at[slot], dst_sems.at[slot]),
        ]

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
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (bm, ec), 0)
                      == (dst_row - block_base))
            m = chunk_buf[slot]                         # (EC, dpad)
            total = acc_ref[:]
            if mode == "f32x2":
                oh16 = onehot.astype(jnp.bfloat16)
                hi, lo = _hi_lo(m)
                total = total + jax.lax.dot_general(
                    oh16, hi, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                total = total + jax.lax.dot_general(
                    oh16, lo, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:  # packed / bf16: stream is ready, single 0/1 pass
                total = total + jax.lax.dot_general(
                    onehot.astype(jnp.bfloat16), m,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[:] = total
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

    out_ref[:] = acc_ref[:]


def _make_kernel(bm: int, ec: int, max_blk: int, n_blocks: int,
                 dpad: int, mode: str, interpret: bool):
    """pallas_call for one segment's accumulate-into-out pass.

    The output carries ONE extra scratch block at the end (rows
    [n_blocks·bm, (n_blocks+1)·bm)): a segment whose blk_lo + max_blk
    overruns the real blocks maps the excess pass-through programs
    there.  Without it the excess indices clamp onto the LAST real
    block and overwrite it with a stale prefetched copy (the pipeline
    fetches the revisited block before the owning program's write
    lands) — silently corrupting the final rows at multi-segment
    scale.  The excess programs all hit the same scratch index in a
    consecutive tail, which Pallas handles as a legal revisit.
    """
    stream_dtype = jnp.float32 if mode == "f32x2" else jnp.bfloat16

    def out_index(i, lo, ptr):
        return (jnp.minimum(lo[0] + i, n_blocks), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # blk_lo, bptr
        grid=(max_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # dst chunks (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # msg chunks (HBM)
            pl.BlockSpec((bm, dpad), out_index),    # running out block
        ],
        out_specs=pl.BlockSpec((bm, dpad), out_index),
        scratch_shapes=[
            pltpu.VMEM((bm, dpad), jnp.float32),      # accumulator
            pltpu.VMEM((2, ec, dpad), stream_dtype),
            pltpu.VMEM((2, 1, ec), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, bm, ec, mode),
        out_shape=jax.ShapeDtypeStruct(((n_blocks + 1) * bm, dpad),
                                       jnp.float32),
        grid_spec=grid_spec,
        # flattened inputs: blk_lo(0) bptr(1) dst(2) msgs(3) prev(4)
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def pallas_spmm(src: jax.Array, dst: jax.Array, weight: jax.Array,
                x: jax.Array, meta: PallasMeta,
                precision: str | None = None,
                interpret: bool = False,
                barrier: bool = False) -> jax.Array:
    """out[d] = Σ_{e: dst[e]=d} w[e]·x[src[e]] — streaming Pallas kernel.

    Edges must be dst-sorted and padded to the segment layout
    (prepare_pallas_graph / pad_edges); ``meta`` carries the per-segment
    block pointers.  The per-segment message gather runs inside the
    scan, so peak HBM stays bounded by one segment regardless of edge
    count.  Returns ((meta.n_blocks + 1) · meta.bm, d) — the final bm
    rows are overrun-program scratch; slice [:n_nodes].
    """
    # the module default resolves OUTSIDE the jitted impl so changing
    # it (config pallas_spmm_precision) cannot hit a stale jit cache
    return _pallas_spmm_jit(src, dst, weight, x, meta,
                            precision or DEFAULT_PRECISION, interpret,
                            barrier)


@functools.partial(jax.jit,
                   static_argnames=("mode", "interpret", "barrier"))
def _pallas_spmm_jit(src: jax.Array, dst: jax.Array, weight: jax.Array,
                     x: jax.Array, meta: PallasMeta,
                     mode: str, interpret: bool,
                     barrier: bool = False) -> jax.Array:
    d = x.shape[1]
    n_seg, seg, ec = meta.n_seg, meta.seg, meta.ec
    # +1 scratch block for overrun pass-through programs (_make_kernel)
    n_pad = (meta.n_blocks + 1) * meta.bm
    src2 = src.reshape(n_seg, seg)
    dst4 = dst.reshape(n_seg, seg // ec, 1, ec)
    w2 = weight.reshape(n_seg, seg)

    if mode == "packed":
        # hi/lo bf16 planes side by side in lanes: one bf16 gather
        # carries f32-grade information at half the f32 stream bytes
        d64 = -(-d // 64) * 64
        if d64 != d:
            x = jnp.pad(x, ((0, 0), (0, d64 - d)))
        xf = x.astype(jnp.float32)
        xh, xl = _hi_lo_bits(xf)
        x_src = jnp.concatenate([xh, xl], axis=1)       # (N, 2·d64) bf16
        dpad = 2 * d64
    else:
        dpad = -(-d // 128) * 128
        if dpad != d:
            # pad the (N, d) table once — far cheaper than padding the
            # (E, d) message stream
            x = jnp.pad(x, ((0, 0), (0, dpad - d)))
        x_src = x

    kernel = _make_kernel(meta.bm, ec, meta.max_blk, meta.n_blocks,
                          dpad, mode, interpret)
    stream_dtype = jnp.float32 if mode == "f32x2" else jnp.bfloat16

    def body(out, seg_in):
        lo_s, bptr_s, src_s, dst_s, w_s = seg_in
        msgs = x_src.at[src_s].get(mode="promise_in_bounds")
        if barrier:
            # keep the gather an unfused pure copy: fusing it with the
            # multiply/split consumers makes XLA emit a row-serial
            # gather loop (~14 ns/row) instead of the bulk copy form
            # (~4-5 ns/row); the extra stream round-trip is ~1 ms/GB
            msgs = jax.lax.optimization_barrier(msgs)
        if mode == "packed":
            # reconstruct w·x per edge in f32 and re-split hi/lo —
            # fuses into the gather's consumer, so the kernel sees a
            # ready bf16 stream and runs a single 0/1-one-hot pass
            m32 = (msgs[:, :d64].astype(jnp.float32)
                   + msgs[:, d64:].astype(jnp.float32)) * w_s[:, None]
            mh, ml = _hi_lo_bits(m32)
            msgs = jnp.concatenate([mh, ml], axis=1)
        else:
            msgs = (msgs * w_s[:, None].astype(msgs.dtype)
                    ).astype(stream_dtype)
        msgs3 = msgs.reshape(seg // ec, ec, dpad)
        return kernel(lo_s, bptr_s, dst_s, msgs3, out), None

    out0 = jnp.zeros((n_pad, dpad), jnp.float32)
    out, _ = jax.lax.scan(
        body, out0, (meta.blk_lo, meta.bptr, src2, dst4, w2))
    if mode == "packed":
        out = out[:, :d64] + out[:, d64:]
    return out[:, :d]
