"""Edge-sharded SpMM — graphs bigger than one chip's HBM.

SURVEY.md §2.7 names edge-sharding as the scaling axis for the GRAPH
dimension ("graphs are sparse and replicable or edge-sharded").
Replication caps the edge count at one chip's HBM; this module
partitions the bucketed-ELL layout (ops/ell_spmm.py) across a mesh
axis by contiguous DESTINATION-node blocks:

  forward   each shard owns the edges of its dst block and produces
            its rows of the output — NO collective (x replicated,
            compute dst-partitioned, out row-sharded over the axis)
  backward  dL/dx[s] = Σ_{e: src[e]=s} w[e]·g[dst[e]]: each shard runs
            a transpose ELL over ITS edges (gather side = its local
            cotangent rows, reduce side = all source nodes), then the
            partial gradients psum over the axis — one all-reduce

shard_map needs uniform per-shard shapes, so every shard's buckets are
built on a COMMON bucket grid and padded to the max rows across shards
(weight-0 slots — exact, like every other padding here).  Node blocks
are equal-size; power-law graphs can imbalance edges across dst blocks
— a known limit, fine for id-ordered catalogs.

Reference counterpart: none — the reference is single-device
(SURVEY.md §2.7); this is a net-new north-star obligation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from recbole_gnn_tpu.ops.ell_spmm import K_CAP, _bucket_grid


@jax.tree_util.register_pytree_node_class
@dataclass
class _StackedEll:
    """One direction's stacked per-shard ELL (leading axis = shard).

    Combine uses the r4 pool-gather form (see ops/ell_spmm.py): the
    per-shard output is ONE gather from [concat of padded bucket
    outputs (n_vrows rows); summed multi-vrow nodes (n_multi); one
    zero row] — per-bucket pad rows and isolated nodes are simply
    never referenced, and the n_vrows-row segment-sum the r3 combine
    paid per shard is gone (its per-row issue cost measured
    2.31 ns/edge single-chip, scripts/diag/r3_ell_breakdown.py)."""

    idxs: tuple              # per bucket: (n_shards, rows_b, K_b) int32
    ws: tuple                # per bucket: (n_shards, rows_b, K_b) f32
    node_src: jax.Array      # (n_shards, n_out) int32 pool row per node
    mgidx: jax.Array | None  # (n_shards, m_max) int32 multi-vrow rows
    msegs: jax.Array | None  # (n_shards, m_max) int32 multi segment ids
    n_out: int               # output rows per shard
    n_multi: int             # max multi-vrow nodes across shards

    def tree_flatten(self):
        return ((self.idxs, self.ws, self.node_src, self.mgidx,
                 self.msegs),
                (self.n_out, self.n_multi))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclass
class ShardedEll:
    """Edge-sharded graph layout: forward + transpose directions.

    fwd reduce side = shard-local dst block (n_out = node_block);
    rev reduce side = GLOBAL source nodes (n_out = n_src_nodes),
    partials psum'd in the backward."""

    fwd: _StackedEll
    rev: _StackedEll
    node_block: int
    n_nodes: int
    n_src_nodes: int
    n_shards: int
    # mesh/axis ride the pytree AUX (hashable statics) so spmm_any can
    # dispatch a ShardedEll graph const without extra plumbing
    mesh: Mesh | None = None
    axis: str = "dp"

    def tree_flatten(self):
        return ((self.fwd, self.rev),
                (self.node_block, self.n_nodes, self.n_src_nodes,
                 self.n_shards, self.mesh, self.axis))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n_edges(self) -> int:
        # padded-slot count (real nnz not retained) — used only for
        # reporting, mirrors Graph.n_edges' role
        return self.e_padded

    @property
    def e_padded(self) -> int:
        return sum(int(np.prod(i.shape)) for i in self.fwd.idxs)


def _fill_bucket(reduce_ids, gather_ids, w, sel, vr, rowptr, K):
    """Vectorized ELL fill for the nodes ``sel`` of one bucket."""
    tot = int(vr.sum())
    idx = np.zeros((tot, K), np.int32)
    wv = np.zeros((tot, K), np.float32)
    vnode = np.repeat(sel, vr).astype(np.int32)
    if tot:
        starts = np.repeat(rowptr[sel], vr) + (
            np.arange(tot) - np.repeat(np.cumsum(vr) - vr, vr)) * K
        ends = np.minimum(starts + K, np.repeat(rowptr[sel + 1], vr))
        lens = (ends - starts).astype(np.int64)
        rows = np.repeat(np.arange(tot), lens)
        cols = np.arange(int(lens.sum())) - np.repeat(
            np.cumsum(lens) - lens, lens)
        epos = np.repeat(starts, lens) + cols
        idx[rows, cols] = gather_ids[epos]
        wv[rows, cols] = w[epos]
    return idx, wv, vnode


def _stacked_direction(edge_shards, n_out):
    """edge_shards: list of (reduce_ids, gather_ids, w) per shard —
    reduce_ids in [0, n_out).  Returns a _StackedEll on a common grid."""
    # common bucket grid over ALL shards' reduce-side degrees
    all_deg = np.concatenate([
        np.bincount(r, minlength=n_out) for r, _, _ in edge_shards])
    pv = np.minimum(np.maximum(all_deg[all_deg > 0], 1), K_CAP)
    bucket_of = _bucket_grid(pv, K_CAP)
    ks = sorted(set(int(k) for k in np.unique(bucket_of[pv]))) or [8]

    per_shard = []
    for reduce_ids, gather_ids, w in edge_shards:
        order = np.argsort(reduce_ids, kind="stable")
        r, g, ww = reduce_ids[order], gather_ids[order], w[order]
        deg = np.bincount(r, minlength=n_out)
        rowptr = np.zeros(n_out + 1, np.int64)
        np.cumsum(deg, out=rowptr[1:])
        pvl = np.minimum(np.maximum(deg, 1), K_CAP)
        kb = np.maximum(bucket_of[pvl], 1)
        n_vr = -(-deg // kb)
        buckets = {}
        for K in ks:
            sel = np.where((kb == K) & (deg > 0))[0]
            buckets[K] = _fill_bucket(r, g, ww, sel, n_vr[sel], rowptr, K)
        per_shard.append(buckets)

    n_shards = len(edge_shards)
    idxs, ws = [], []
    rmaxes = {K: max(sh[K][0].shape[0] for sh in per_shard) for K in ks}
    for K in ks:
        i_st = np.zeros((n_shards, rmaxes[K], K), np.int32)
        w_st = np.zeros((n_shards, rmaxes[K], K), np.float32)
        for s, sh in enumerate(per_shard):
            idx, wv, _ = sh[K]
            i_st[s, :idx.shape[0]] = idx
            w_st[s, :wv.shape[0]] = wv
        idxs.append(jnp.asarray(i_st))
        ws.append(jnp.asarray(w_st))

    vlen = sum(rmaxes.values())
    # pool-gather combine plan per shard (see _StackedEll docstring):
    # pad vrows are marked with a sentinel and never referenced
    per_plan = []
    for sh in per_shard:
        parts = []
        for K in ks:
            vn = sh[K][2]
            parts.append(np.concatenate(
                [vn, np.full(rmaxes[K] - vn.shape[0], n_out, np.int32)]))
        vn_all = np.concatenate(parts)          # sentinel n_out = pad
        order = np.argsort(vn_all, kind="stable")
        counts = np.bincount(vn_all, minlength=n_out + 1)[:n_out]
        starts = np.cumsum(counts) - counts
        single = counts == 1
        multi = counts > 1
        n_multi = int(multi.sum())
        node_src = np.full(n_out, -1, np.int64)  # filled after m_max known
        node_src[single] = order[starts[single]]
        mcounts = counts[multi]
        total_m = int(mcounts.sum())
        off = np.arange(total_m) - np.repeat(
            np.cumsum(mcounts) - mcounts, mcounts)
        mpos = np.repeat(starts[multi], mcounts) + off
        per_plan.append((node_src, multi, n_multi,
                         order[mpos], np.repeat(np.arange(n_multi),
                                                mcounts)))

    n_multi_max = max((p[2] for p in per_plan), default=0)
    m_max = 0
    for p in per_plan:
        m_max = max(m_max, len(p[3]))
    node_srcs = np.zeros((n_shards, n_out), np.int32)
    mgidxs = np.zeros((n_shards, m_max), np.int32)
    msegss = np.zeros((n_shards, m_max), np.int32)
    zero_row = vlen + n_multi_max              # pool layout: vr|msums|zero
    for s, (node_src, multi, n_multi, mg, msg) in enumerate(per_plan):
        node_src[node_src < 0] = zero_row      # isolated nodes
        node_src[multi] = vlen + np.arange(n_multi)
        node_srcs[s] = node_src
        # pad the multi lists with (vr row 0, dummy segment): the dummy
        # segment lands at index n_multi_max and is sliced off
        mgidxs[s] = np.concatenate(
            [mg, np.zeros(m_max - len(mg), np.int64)])
        msegss[s] = np.concatenate(
            [msg, np.full(m_max - len(msg), n_multi_max, np.int64)])
    return _StackedEll(
        tuple(idxs), tuple(ws), jnp.asarray(node_srcs),
        jnp.asarray(mgidxs) if n_multi_max else None,
        jnp.asarray(msegss) if n_multi_max else None,
        int(n_out), int(n_multi_max))


def build_sharded_ell(src, dst, w, n_nodes, n_shards,
                      n_src_nodes=None, mesh: Mesh | None = None,
                      axis: str = "dp") -> ShardedEll:
    """Host build: partition edges by contiguous dst blocks; build the
    forward (reduce=local dst) and transpose (reduce=global src)
    stacked layouts.  Pass ``mesh``/``axis`` to make the result
    self-dispatching through ops.spmm.spmm_any."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float32)
    n_nodes = int(n_nodes)
    n_src = int(n_src_nodes if n_src_nodes is not None else n_nodes)
    node_block = -(-n_nodes // int(n_shards))

    fwd_shards, rev_shards = [], []
    for s in range(int(n_shards)):
        lo, hi = s * node_block, (s + 1) * node_block
        m = (dst >= lo) & (dst < hi)
        ss, dd, ww = src[m], dst[m] - lo, w[m]
        fwd_shards.append((dd, ss, ww))      # reduce by local dst
        rev_shards.append((ss, dd, ww))      # reduce by global src,
        #                                      gather from local g rows
    fwd = _stacked_direction(fwd_shards, node_block)
    rev = _stacked_direction(rev_shards, n_src)
    return ShardedEll(fwd, rev, node_block, n_nodes, n_src,
                      int(n_shards), mesh, axis)


def _ell_apply(idxs, ws, x, d):
    """One shard's ELL contraction (bucket blocks arrive with their
    leading shard axis of size 1)."""
    outs = []
    for idx, wv in zip(idxs, ws):
        i2, w2 = idx[0], wv[0]
        g = x[i2.reshape(-1)].reshape(i2.shape[0], i2.shape[1], d)
        outs.append(jnp.einsum("nkd,nk->nd", g, w2))
    return jnp.concatenate(outs, axis=0)


def _combine(stacked: _StackedEll, vr, node_src, mgidx, msegs, d):
    """Per-shard pool-gather combine (mirrors ops/ell_spmm.py r4)."""
    pool = [vr]
    if stacked.n_multi:
        msums = jax.ops.segment_sum(vr[mgidx[0]], msegs[0],
                                    num_segments=stacked.n_multi + 1,
                                    indices_are_sorted=True)
        pool.append(msums[:stacked.n_multi])   # drop the pad segment
    pool.append(jnp.zeros((1, d), vr.dtype))
    return jnp.concatenate(pool, axis=0)[node_src[0]]


def sharded_ell_spmm(meta: ShardedEll, x: jax.Array, mesh: Mesh,
                     axis: str = "dp") -> jax.Array:
    """out = A @ x over the edge-sharded layout; differentiable (the
    backward all-reduces per-shard transpose contributions)."""
    d = x.shape[-1]
    node_block = meta.node_block
    n_src = meta.n_src_nodes
    fwd, rev = meta.fwd, meta.rev
    n_fb = len(fwd.idxs)
    n_rb = len(rev.idxs)

    def _mspecs(stacked):
        # mgidx/msegs are None when no shard has multi-vrow nodes;
        # None legs still need a spec slot in shard_map
        return (P(axis), P(axis)) if stacked.n_multi else (None, None)

    @jax.custom_vjp
    def _f(x_):
        def fwd_shard(node_src, mgidx, msegs, x_rep, *arrs):
            vr = _ell_apply(arrs[:n_fb], arrs[n_fb:], x_rep, d)
            return _combine(fwd, vr, node_src, mgidx, msegs, d)[None]

        out = shard_map(
            fwd_shard, mesh=mesh,
            in_specs=(P(axis),) + _mspecs(fwd) + (P(),)
            + (P(axis),) * (2 * n_fb),
            out_specs=P(axis),
        )(fwd.node_src, fwd.mgidx, fwd.msegs, x_, *fwd.idxs, *fwd.ws)
        return out.reshape(-1, d)[:meta.n_nodes]

    def _vjp_fwd(x_):
        return _f(x_), None

    def _vjp_bwd(_, g):
        n_pad = node_block * meta.n_shards
        gp = jnp.pad(g, ((0, n_pad - meta.n_nodes), (0, 0)))
        gp = gp.reshape(meta.n_shards, node_block, d)

        def bwd_shard(node_src, mgidx, msegs, g_blk, *arrs):
            vr = _ell_apply(arrs[:n_rb], arrs[n_rb:], g_blk[0], d)
            return _combine(rev, vr, node_src, mgidx, msegs, d)[None]

        parts = shard_map(
            bwd_shard, mesh=mesh,
            in_specs=(P(axis),) + _mspecs(rev) + (P(axis),)
            + (P(axis),) * (2 * n_rb),
            out_specs=P(axis),
        )(rev.node_src, rev.mgidx, rev.msegs, gp, *rev.idxs, *rev.ws)
        # (n_shards, n_src, d) partials, sharded on axis 0 — GSPMD
        # lowers the sum to the cross-shard all-reduce
        return (jnp.sum(parts, axis=0),)

    _f.defvjp(_vjp_fwd, _vjp_bwd)
    return _f(x)
