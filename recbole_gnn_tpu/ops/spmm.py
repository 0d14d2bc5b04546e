"""Sparse adjacency × dense feature products (SpMM) — the hot kernel.

TPU-native replacement for torch_sparse.matmul / torch.spmm (reference:
recbole_gnn/model/layers.py:19-20, lightgcl.py:119-142).  The graph is a
*static* COO triple sorted by destination row, built once on host.

Three device implementations, selected by ``SPMM_IMPL``
(config ``sparse_spmm_impl``); honest carry-dependent measurements on
v5e / jax 0.9 at 500k nodes / 10M edges / d64
(scripts/diag/r3_sparse_probe*.py):
  * "ell" (default): bucketed-ELL (ops/ell_spmm.py) — host-side
    degree bucketing turns the reduction into a fixed-shape streaming
    axis sum, leaving only the irreducible row gather (4.5 ns/row).
    The round-2 "14 ns/edge gather floor" was a misattribution: XLA's
    sorted segment-sum alone costs 9.6 ns/EDGE (per-row issue-bound —
    width/dtype-blind), the gather only 4.5.
  * "xla": gather + ``indices_are_sorted=True`` segment-sum
    (14.8 ns/edge measured) — used automatically for dynamically
    re-weighted graphs (with_weight clears the baked-weight ELL).
  * "pallas": the streaming one-hot-MXU kernel (ops/pallas_spmm.py),
    bounded-HBM at any edge count, ~14.6 ns/edge (its EC-wide one-hot
    reduction costs what segment-sum costs) — a selectable hedge.

Design notes (TPU-first):
  * static nnz — edge dropout / augmentation zero weights instead of
    resizing (SURVEY.md §7.3), so every jit trace sees one shape;
  * dst-sorted edges → ``indices_are_sorted=True`` segment sums;
  * custom VJP: the autodiff gradient of the gather would be an XLA
    scatter-add over UNSORTED indices (slow and nondeterministic-
    ordered).  Instead the graph carries its *transposed edge
    ordering* (rev_src/rev_dst/rev_edge_id, built once on host), and
    the backward runs the transpose SpMM as another sorted
    segment-sum.  ``rev_edge_id`` indexes the live weight array, so
    dynamically re-weighted graphs (edge dropout, SGL/SEPT
    augmentation) stay consistent.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class Graph:
    """Static COO graph, edges sorted by ``dst``, with transposed
    ordering for the backward pass.

    Registered as a pytree whose children are the edge arrays and whose
    aux data is (n_nodes, n_src_nodes) — static python ints across jit
    boundaries (segment ops need them concrete).

    Attributes:
      src: (E,) int32 source node per edge.
      dst: (E,) int32 destination node per edge, non-decreasing.
      weight: (E,) float32 edge weight (0.0 == masked/padding edge).
      rev_src / rev_dst: (E,) transposed edge list (flipped edges,
        sorted by the new dst = original src).
      rev_edge_id: (E,) original edge index of each transposed edge —
        weights for the backward are gathered through this.
      n_nodes: static int — number of destination nodes (output rows).
      n_src_nodes: static int — number of source nodes (input rows).
    """

    src: jax.Array
    dst: jax.Array
    weight: jax.Array
    rev_src: jax.Array | None
    rev_dst: jax.Array | None
    rev_edge_id: jax.Array | None
    n_nodes: int
    n_src_nodes: int
    block_ptr: object | None = None      # PallasMeta (streaming kernel)
    rev_block_ptr: object | None = None  # ... for the transpose pass
    nnz: int | None = None               # real edges (excl. pallas pad)
    # bucketed-ELL layouts (ops/ell_spmm.py) — the round-3 default
    # sparse path (reduction at bandwidth instead of the 9.6 ns/row
    # segment-sum).  Weights are BAKED into these at build time:
    # with_weight() clears them and re-weighted graphs fall back to
    # the segment-sum path.
    ell: object | None = None            # EllMeta, forward direction
    rev_ell: object | None = None        # EllMeta, transpose (backward)
    # weight already permuted to the transposed edge ordering
    # (= weight[rev_edge_id]).  A 12M-element XLA gather runs at
    # ~5 ns/row on v5e (~60 ms at gowalla scale), so the backward must
    # NOT recompute it per layer: build_graph precomputes it for static
    # weights; with_weight() clears it and the backward falls back to
    # the per-call gather only for dynamically re-weighted graphs.
    rev_weight: jax.Array | None = None

    def tree_flatten(self):
        return ((self.src, self.dst, self.weight, self.rev_src,
                 self.rev_dst, self.rev_edge_id, self.block_ptr,
                 self.rev_block_ptr, self.rev_weight, self.ell,
                 self.rev_ell),
                (self.n_nodes, self.n_src_nodes, self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (src, dst, weight, rs, rd, re, bp, rbp, rw, ell,
         rev_ell) = children
        return cls(src, dst, weight, rs, rd, re, aux[0], aux[1],
                   bp, rbp, aux[2], ell, rev_ell, rw)

    @property
    def n_edges(self) -> int:
        """Real (unpadded) edge count."""
        return self.nnz if self.nnz is not None else self.src.shape[0]

    @property
    def n_edges_padded(self) -> int:
        return self.src.shape[0]

    def reverse(self) -> "Graph":
        """Transposed view (host-free: swaps the stored orderings)."""
        if self.rev_src is None:
            raise ValueError("graph built without reverse ordering")
        inv = jnp.argsort(self.rev_edge_id)
        rw = (self.weight[self.rev_edge_id] if self.rev_weight is None
              else self.rev_weight)
        return Graph(
            src=self.rev_src, dst=self.rev_dst,
            weight=rw,
            # transpose-of-transpose backward list is this graph's own
            # dst-sorted edge list; edge k there is rev edge inv[k]
            rev_src=self.src, rev_dst=self.dst, rev_edge_id=inv,
            n_nodes=self.n_src_nodes, n_src_nodes=self.n_nodes,
            block_ptr=self.rev_block_ptr, rev_block_ptr=self.block_ptr,
            nnz=self.nnz, ell=self.rev_ell, rev_ell=self.ell,
            # rw[inv] = weight[reid][inv] = weight
            rev_weight=self.weight)

    def with_weight(self, weight: jax.Array,
                    rev_weight: jax.Array | None = None,
                    rebuild_ell: bool = False) -> "Graph":
        """New graph with re-weighted edges (dropout / augmentation).
        Pass ``rev_weight`` (= weight[rev_edge_id]) if you can compute
        it cheaply (e.g. once per epoch); otherwise the backward pays a
        per-call (E,) gather to rebuild it.

        ELL handling: by default the bucketed-ELL layouts are CLEARED
        (their weights are baked at build time) and the re-weighted
        graph runs on the segment-sum path.  With ``rebuild_ell=True``
        the layouts are re-weighted in place (two (E_pad,) scalar
        gathers via the recorded edge ids) and the graph keeps ELL
        speed — do this ONCE PER EPOCH (SGL/SEPT augmentation), never
        per step: the gathers are per-row-cost like any gather."""
        ell = rev_ell = None
        if rebuild_ell and self.ell is not None \
                and getattr(self.ell, "eposs", None) is not None:
            from recbole_gnn_tpu.ops.ell_spmm import ell_reweight
            w_real = weight[:self.n_edges]   # strip pallas padding
            ell = ell_reweight(self.ell, w_real)
            rev_ell = ell_reweight(self.rev_ell, w_real)
        return replace(self, weight=weight, rev_weight=rev_weight,
                       ell=ell, rev_ell=rev_ell)


def build_graph(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
                n_nodes: int, n_src_nodes: int | None = None,
                sort: bool = True, with_reverse: bool = True,
                with_pallas: bool = False,
                with_ell: bool = True) -> Graph:
    """Host-side constructor: sorts edges by dst; precomputes the
    transposed ordering for the custom-VJP backward.  With ``with_ell``
    (default) the bucketed-ELL layouts (forward + transpose) are
    attached — the measured-fastest sparse path (ops/ell_spmm.py).
    With ``with_pallas`` the edge list is additionally padded to the
    streaming-kernel segment layout and PallasMeta attached for
    ops.pallas_spmm (the selectable hedge)."""
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    weight = np.asarray(weight, dtype=np.float32)
    if n_src_nodes is None:
        n_src_nodes = n_nodes
    block_ptr = rev_block_ptr = None
    nnz = len(src)
    if with_pallas:
        from recbole_gnn_tpu.ops.pallas_spmm import prepare_pallas_graph
        src, dst, weight, block_ptr = prepare_pallas_graph(
            src, dst, weight, n_nodes)
        sort = False  # already dst-sorted + padded
    if sort:
        order = np.argsort(dst, kind="stable")
        src, dst, weight = src[order], dst[order], weight[order]
    ell = rev_ell = None
    if with_ell and with_reverse:
        from recbole_gnn_tpu.ops.ell_spmm import build_ell
        # layouts built from the REAL edges only (positions ≥ nnz are
        # pallas padding).  Forward: reduce by dst, gather by src.
        # Transpose (the custom-VJP backward): reduce by src, gather
        # by dst — re-sorted here on host.  Both record per-slot edge
        # ids in CANONICAL (dst-sorted) space so with_weight(...,
        # rebuild_ell=True) can regather epoch-level dynamic weights.
        ell = build_ell(src[:nnz], dst[:nnz], weight[:nnz], n_nodes,
                        with_epos=True)
        r_order = np.argsort(src[:nnz], kind="stable")
        rev_ell = build_ell(dst[:nnz][r_order], src[:nnz][r_order],
                            weight[:nnz][r_order], n_src_nodes,
                            with_epos=True, edge_ids=r_order)
    rev_src = rev_dst = rev_eid = rev_w = None
    if with_reverse:
        rev_order = np.argsort(src, kind="stable").astype(np.int32)
        rev_src = dst[rev_order]
        rev_dst = src[rev_order]
        rev_eid = rev_order
        rev_w = weight[rev_order]
        if with_pallas:
            from recbole_gnn_tpu.ops.pallas_spmm import build_pallas_meta
            rev_block_ptr = build_pallas_meta(rev_dst, n_src_nodes)
    as_j = lambda a: None if a is None else jnp.asarray(a)
    return Graph(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(weight),
                 as_j(rev_src), as_j(rev_dst), as_j(rev_eid),
                 int(n_nodes), int(n_src_nodes),
                 block_ptr, rev_block_ptr, int(nnz), ell, rev_ell,
                 as_j(rev_w))


# peak bytes allowed for the materialized (E, D) message stream before
# the edge-chunked accumulation path kicks in (HBM headroom guard).
# 4 GB admits gowalla-scale (12M edges × 64 lanes ≈ 3 GB transient)
# unchunked on a 16 GB v5e; beyond it the fori_loop chunking bounds
# peak memory at the cost of extra dispatches.
MSGS_BYTES_BUDGET = 1 << 32     # 4 GB

# sparse-path implementation (config key `sparse_spmm_impl`):
#   "ell"    (default) bucketed-ELL: gather + streaming axis-sum
#            (ops/ell_spmm.py) — measured fastest on v5e (r3 probes:
#            reduction at bandwidth vs segment-sum's 9.6 ns/row)
#   "xla"    gather + sorted segment-sum (14.8 ns/edge measured)
#   "pallas" streaming one-hot MXU kernel (ops/pallas_spmm.py) — hedge
SPMM_IMPL = "ell"


def spmm_coo(src: jax.Array, dst: jax.Array, weight: jax.Array,
             x: jax.Array, n_out: int,
             indices_are_sorted: bool = True) -> jax.Array:
    """out[d] = Σ_{e: dst[e]=d} weight[e] · x[src[e]] (no custom VJP —
    the autodiff path; use spmm() with a built Graph in hot loops).

    Large graphs (E·D beyond MSGS_BYTES_BUDGET) accumulate over edge
    chunks so the gathered message stream never materializes whole."""
    e = src.shape[0]
    d = x.shape[1]
    if e * d * 4 > MSGS_BYTES_BUDGET:
        return _spmm_coo_chunked(src, dst, weight, x, n_out,
                                 indices_are_sorted)
    msgs = x[src] * weight[:, None].astype(x.dtype)
    return jax.ops.segment_sum(msgs, dst, num_segments=n_out,
                               indices_are_sorted=indices_are_sorted)


def _spmm_coo_chunked(src, dst, weight, x, n_out, indices_are_sorted,
                      chunk: int | None = None):
    """Edge-chunked accumulation: Σ_g segment_sum over chunk g (exact —
    partial segment sums add).  Pads the edge arrays with weight-0
    edges onto the LAST node: dst stays non-decreasing, so the
    ``indices_are_sorted`` hint passed to segment_sum remains truthful
    (a false hint on the XLA scatter is implementation-defined on TPU)."""
    e = src.shape[0]
    d = x.shape[1]
    if chunk is None:
        # budget / (2·d·4): the in-flight gathered chunk plus the same
        # volume of segment-sum intermediate
        chunk = max(1, MSGS_BYTES_BUDGET // (2 * d * 4))
        chunk = min(e, chunk)
    n_chunks = -(-e // chunk)
    pad = n_chunks * chunk - e
    if pad:
        src = jnp.concatenate([src, jnp.zeros((pad,), src.dtype)])
        dst = jnp.concatenate(
            [dst, jnp.full((pad,), n_out - 1, dst.dtype)])
        weight = jnp.concatenate(
            [weight, jnp.zeros((pad,), weight.dtype)])

    def body(g, acc):
        s = jax.lax.dynamic_slice_in_dim(src, g * chunk, chunk)
        t = jax.lax.dynamic_slice_in_dim(dst, g * chunk, chunk)
        w = jax.lax.dynamic_slice_in_dim(weight, g * chunk, chunk)
        msgs = x[s] * w[:, None].astype(x.dtype)
        return acc + jax.ops.segment_sum(
            msgs, t, num_segments=n_out,
            indices_are_sorted=indices_are_sorted)

    acc0 = jnp.zeros((n_out, d), x.dtype)
    return jax.lax.fori_loop(0, n_chunks, body, acc0)


def _zero_cot(x):
    """Zero cotangent for a pytree leaf: float0 for integer leaves
    (jax's required tangent dtype), zeros_like otherwise — DCE'd under
    jit since nothing consumes graph cotangents."""
    if jnp.issubdtype(jnp.result_type(x), jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(np.shape(x), jax.dtypes.float0)


def _spmm_dispatch(conf, graph, x_):
    use_ell, use_pallas, _ = conf
    if use_ell:
        from recbole_gnn_tpu.ops.ell_spmm import ell_spmm
        return ell_spmm(graph.ell, x_)   # weights baked into the layout
    if use_pallas:
        from recbole_gnn_tpu.ops.pallas_spmm import pallas_spmm
        return pallas_spmm(graph.src, graph.dst, graph.weight, x_,
                           graph.block_ptr)[:graph.n_nodes]
    return spmm_coo(graph.src, graph.dst, graph.weight, x_, graph.n_nodes)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_core(conf, graph, x_):
    """Module-level custom-VJP SpMM: the graph rides as an EXPLICIT
    pytree argument, never a closure — a custom_vjp whose fwd/bwd
    close over tracers leaks them out of a surrounding jax.checkpoint
    scope (hit by SGL's rematerialized view propagations, r4)."""
    return _spmm_dispatch(conf, graph, x_)


def _spmm_core_fwd(conf, graph, x_):
    return _spmm_dispatch(conf, graph, x_), (graph, x_)


def _spmm_core_bwd(conf, res, g):
    use_ell, use_pallas, weight_grad = conf
    graph, x_ = res
    rev_w = graph.rev_weight
    # dL/dx[s] = Σ_{e: src[e]=s} w[e]·g[dst[e]] — transpose SpMM.
    # Use the precomputed transposed weights when available: the
    # (E,) gather w[reid] costs ~5 ns/row on v5e (~60 ms/layer at
    # gowalla scale) if paid per backward.
    if use_ell:
        from recbole_gnn_tpu.ops.ell_spmm import ell_spmm
        gx = ell_spmm(graph.rev_ell, g)
    elif use_pallas and graph.rev_block_ptr is not None:
        from recbole_gnn_tpu.ops.pallas_spmm import pallas_spmm
        rw = (rev_w if rev_w is not None
              else graph.weight[graph.rev_edge_id])
        gx = pallas_spmm(graph.rev_src, graph.rev_dst, rw, g,
                         graph.rev_block_ptr)[:graph.n_src_nodes]
    else:
        rw = (rev_w if rev_w is not None
              else graph.weight[graph.rev_edge_id])
        # spmm_coo auto-chunks huge graphs (no full msgs stream)
        gx = spmm_coo(graph.rev_src, graph.rev_dst, rw, g,
                      graph.n_src_nodes)
    g_graph = jax.tree_util.tree_map(_zero_cot, graph)
    if weight_grad:
        # dL/dw[e] = x[src[e]] · g[dst[e]]
        gw = jnp.sum(x_[graph.src] * g[graph.dst], axis=-1)
        g_graph = replace(g_graph, weight=gw)
    return g_graph, gx


_spmm_core.defvjp(_spmm_core_fwd, _spmm_core_bwd)


def spmm(graph: Graph, x: jax.Array,
         weight_grad: bool = False) -> jax.Array:
    """SpMM over a :class:`Graph`.  The x-gradient runs as a transpose
    SpMM over the pre-sorted reversed edges (sorted segment-sum, never
    an unsorted scatter).

    ``weight_grad``: no model in the zoo learns edge weights (dropout /
    augmentation weights are recomputed from masks, never parameters),
    so by default the weight cotangent is a zeros placeholder and the
    two (E, D) gathers it would cost per backward are skipped.  Pass
    ``weight_grad=True`` if you genuinely differentiate w.r.t.
    ``graph.weight``."""
    if graph.rev_src is None:
        return spmm_coo(graph.src, graph.dst, graph.weight, x, graph.n_nodes)

    # impl dispatch: bucketed-ELL when its layout is present (cleared
    # by with_weight — baked weights) and selected; the streaming
    # Pallas kernel when ITS metadata is present and selected; XLA
    # sorted segment-sum otherwise
    use_ell = (graph.ell is not None and graph.rev_ell is not None
               and SPMM_IMPL == "ell")
    use_pallas = (graph.block_ptr is not None and _pallas_available()
                  and SPMM_IMPL == "pallas")
    return _spmm_core((use_ell, use_pallas, weight_grad), graph, x)


def _pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@jax.tree_util.register_pytree_node_class
@dataclass
class BipartiteDenseGraph:
    """Dense normalized bipartite adjacency — the MXU fast path.

    At the reference's benchmark scales (ml-1m: 6,041×3,630; lastfm:
    1,892×17,632) the rectangular normalized interaction block fits in
    HBM as a dense matrix, and two MXU matmuls per propagation layer
    (U←A·I, I←Aᵀ·U) run ~50× faster than any scatter/segment path on
    TPU (measured: 23 ms XLA segment-sum vs <1 ms dense for 2M nnz).
    Density-based dispatch lives in the dataset graph builder; the
    sparse ``Graph`` path remains for web-scale catalogs.

    ``a`` is the (n_users, n_items) sym-normalized block of the lifted
    square adjacency [[0, A],[Aᵀ, 0]] — propagation semantics identical
    to the COO path (reference dataset.py:60-79).
    """

    a: jax.Array
    n_users: int
    n_items: int
    nnz: int

    def tree_flatten(self):
        return (self.a,), (self.n_users, self.n_items, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def n_nodes(self) -> int:
        return self.n_users + self.n_items

    @property
    def n_edges(self) -> int:
        return 2 * self.nnz


def build_dense_bipartite(users: np.ndarray, items: np.ndarray,
                          weights: np.ndarray, n_users: int, n_items: int,
                          dtype=jnp.float32) -> BipartiteDenseGraph:
    """Densify a (user, item, weight) COO block (duplicates summed)."""
    a = np.zeros((n_users, n_items), dtype=np.float32)
    np.add.at(a, (users, items), weights)
    return BipartiteDenseGraph(jnp.asarray(a, dtype=dtype),
                               int(n_users), int(n_items), len(users))


def spmm_dense_bipartite(graph: BipartiteDenseGraph, x: jax.Array) -> jax.Array:
    xu, xi = x[:graph.n_users], x[graph.n_users:]
    out_u = jnp.dot(graph.a, xi, preferred_element_type=jnp.float32)
    out_i = jnp.dot(graph.a.T, xu, preferred_element_type=jnp.float32)
    return jnp.concatenate([out_u, out_i], axis=0)


def spmm_any(graph, x: jax.Array) -> jax.Array:
    """Dispatch over graph representations (dense bipartite | COO |
    edge-sharded ELL)."""
    if isinstance(graph, BipartiteDenseGraph):
        return spmm_dense_bipartite(graph, x)
    if type(graph).__name__ == "ShardedEll":   # lazy import avoidance
        from recbole_gnn_tpu.parallel.sharded_spmm import sharded_ell_spmm
        return sharded_ell_spmm(graph, x, graph.mesh, graph.axis)
    return spmm(graph, x)


def spmm_dense_bipartite_dropout(graph: BipartiteDenseGraph, x: jax.Array,
                                 rng: jax.Array, drop_p: float) -> jax.Array:
    """Dense propagation with per-direction edge dropout (no rescale),
    matching PyG dropout_adj semantics on the COO path (each direction
    dropped independently, weights kept as-is — ngcf.py:75-93)."""
    k1, k2 = jax.random.split(rng)
    xu, xi = x[:graph.n_users], x[graph.n_users:]
    m1 = jax.random.bernoulli(k1, 1.0 - drop_p, graph.a.shape)
    m2 = jax.random.bernoulli(k2, 1.0 - drop_p, graph.a.shape)
    a1 = jnp.where(m1, graph.a, 0.0)
    a2 = jnp.where(m2, graph.a, 0.0)
    out_u = jnp.dot(a1, xi, preferred_element_type=jnp.float32)
    out_i = jnp.dot(a2.T, xu, preferred_element_type=jnp.float32)
    return jnp.concatenate([out_u, out_i], axis=0)


def matvec_any(m, x: jax.Array) -> jax.Array:
    """Matrix-vector(-batch) product over either representation:
    a dense jnp matrix (MXU) or a sparse Graph (segment-sum)."""
    if isinstance(m, Graph):
        return spmm(m, x)
    return jnp.dot(m, x, preferred_element_type=jnp.float32)
