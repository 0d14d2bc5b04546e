"""Bucketed-ELL SpMM — the round-3 production sparse path.

TPU-native replacement for torch_sparse.matmul (reference:
recbole_gnn/model/layers.py:19-20) at web scale, superseding the XLA
sorted-segment-sum default after round-3 hardware probes
(scripts/diag/r3_sparse_probe*.py, v5e, 500k nodes / 10M edges / d64):

  gather x[idx]              4.5 ns/row  (issue-bound: blind to width,
                                          dtype, index order)
  XLA sorted segment-sum     9.6 ns/EDGE (per-row issue-bound — NOT
                                          bandwidth: d=128 f32 and
                                          d=64 bf16 time identically)
  streaming Pallas one-hot   ~9.5 ns/edge (EC-wide one-hot costs
                                          ~262 KFLOP/edge on the MXU)
  full gather+segsum SpMM    14.8 ns/edge

The round-2 "~14 ns/edge is the per-edge gather floor" conclusion was
wrong: the gather is 4.5 of those ns; the REDUCTION is the pig.  This
layout makes the reduction a fixed-shape axis sum, which XLA streams at
HBM bandwidth (~0.5 ns/edge), leaving only the irreducible gather:

  host prep   nodes are bucketed by in-degree: a small DP picks
              ≤ MAX_BUCKETS widths (multiples of 8 — sublane tiling —
              up to K_CAP=256; nodes beyond K_CAP split into several
              virtual rows); each (virtual) row's edge list is padded
              to the bucket K with weight-0 edges on source row 0
  device      per bucket:  out_b = Σ_k  w[:, k] · x[idx[:, k]]
              — an (n_b·K) row gather + streaming multiply-sum
  combine     ONE output gather from the pooled bucket outputs via a
              HOST-precomputed per-node source row (node_src): nodes
              with deg ≤ K_CAP read their single bucket row directly,
              deg > K_CAP nodes (rare) a tiny segment-sum, isolated
              nodes a zero row.  (r4: the previous gather +
              n_vrows-row segment-sum combine cost 2.31 ns/EDGE —
              27.8 of 133 ms at gowalla shape, r3_ell_breakdown.py
              case H — because segment-sum pays a per-ROW issue cost;
              the single gather pays it once per NODE.)

Measured (same probe protocol, 10M-edge bench shape): 8.8 ns/edge
with pow2 buckets (E_pad/E = 1.34); mult-8 DP grid 7.1; with the r4
(1,2,4) ladder + pool-gather combine **6.66 ns/edge = 0.91 of the
~5.1 ns/row gather-floor ceiling** (PARITY.md round-4 floor proof).
Weights are baked into the layout at build time; dynamic weights have
two routes: Graph.with_weight(...) clears the layouts (per-STEP
re-weighting → segment-sum path), and with_weight(rebuild_ell=True) /
reweight_ws regather the slot weights via recorded edge ids — the
per-EPOCH route (SGL/SEPT augmentation) that keeps ELL speed.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# nodes with degree > K_CAP are split into ceil(deg/K) virtual rows;
# the bucket grid itself is chosen per graph by a small DP (below)
K_CAP = 256
# max number of degree buckets: each bucket is a separate gather op,
# and per-op overhead is real (hardware-measured: a multiples-of-4
# grid with ~40 occupied buckets ran 95 ms where the probe's 8-bucket
# pow2 grid ran 86 ms despite 25% MORE padded edges)
MAX_BUCKETS = 12

# sub-8 bucket width(s) allowed for the lowest-degree groups: an int
# (one width) or an ascending tuple (a ladder the DP may use).
# Hardware-measured ladder progression at gowalla shape (1.4M nodes,
# avg deg 8.6; scripts/diag/r3_gowalla_step.py k8/k4/k124 A/B):
#   no sub-8 (k8):   E_pad/E 1.427, fwd SpMM 17.21 ns/edge
#   K=4 only:        E_pad/E 1.210, 11.33 ns/edge
#   (1,2,4) ladder:  E_pad/E 1.173, 10.90 ns/edge, step 810→780 ms
# At the high-avg-degree bench shape (500k nodes, avg deg 20) the DP
# never picks the sub-4 widths — grid and time identical (71 ms) —
# so the ladder is identical-or-better everywhere and is the default.
# The FULL sub-8 ladder (1..7) was also measured (k1to7 A/B): E_pad/E
# 1.173 → 1.080 but fwd 119.3 → 120.7 ms and step 709 → 749 ms — the
# odd widths' extra per-op launches and unaligned (n, K) tiles eat
# the 8% fewer gathered rows; pow2 sub-8 widths only.
# 0/None disables (see _bucket_grid.kof).
_K_SMALL = (1, 2, 4)

# per-bucket gathered-message budget: buckets whose (rows·K·D·4) stream
# would exceed this are processed in static row chunks so the transient
# (n_b, K, D) message block stays bounded at any edge count
BUCKET_BYTES_BUDGET = 1 << 31   # 2 GB


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMeta:
    """Device-side bucketed-ELL layout (pytree).

    Attributes:
      idxs: tuple of (n_b, K_b) int32 — source node per slot (0-padded).
      ws: tuple of (n_b, K_b) float32 — edge weight per slot (0-padded).
      node_src: (n_nodes,) int32 — pool row per output node, where the
        pool is [concat of per-bucket outputs (n_vrows rows); summed
        multi-vrow nodes (n_multi rows); one zero row].  Single-vrow
        nodes (every node with degree ≤ K_CAP — the overwhelming
        majority) point straight at their bucket output row, isolated
        nodes at the zero row, so the combine is ONE output gather
        instead of a gather + n_vrows-row segment-sum (r4: the segsum's
        per-row issue cost was 2.3 ns/EDGE of the SpMM —
        scripts/diag/r3_ell_breakdown.py case H).
      mgidx: (n_multi_vrows,) int32 | None — concat positions of the
        virtual rows of multi-vrow nodes, grouped by node.
      msegs: (n_multi_vrows,) int32 — 0..n_multi−1 segment ids for the
        (tiny) multi-node segment-sum.
      n_nodes: static int — output rows.
      n_multi: static int — number of nodes split into >1 virtual row
        (degree > K_CAP only).
    """

    idxs: tuple
    ws: tuple
    node_src: jax.Array
    mgidx: jax.Array | None
    msegs: jax.Array | None
    n_nodes: int
    n_multi: int
    # optional per-slot EDGE ids (into the graph's dst-sorted edge
    # array; pad slots point one past the end) — lets ell_reweight
    # regather dynamic weights into the layout (epoch-level
    # augmentation: SGL/SEPT) instead of falling back to segment-sum
    eposs: tuple | None = None

    def tree_flatten(self):
        return ((self.idxs, self.ws, self.node_src, self.mgidx,
                 self.msegs, self.eposs),
                (self.n_nodes, self.n_multi))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], children[3],
                   children[4], aux[0], aux[1], children[5])

    @property
    def e_padded(self) -> int:
        return sum(int(i.shape[0]) * int(i.shape[1]) for i in self.idxs)


def _bucket_grid(per_vrow: np.ndarray, k_cap: int,
                 max_buckets: int = MAX_BUCKETS) -> np.ndarray:
    """DP-optimal degree→bucket-K mapping: partition the occupied
    capped-degree values into ≤ max_buckets groups (group K = its max
    degree) minimizing total padding Σ nodes·(K − deg).  Returns
    bucket_of[d] for d in 0..k_cap."""
    vals, counts = np.unique(per_vrow, return_counts=True)
    m = len(vals)
    if m == 0:
        return np.zeros(k_cap + 1, np.int64)
    b_max = min(max_buckets, m)
    # prefix sums for group cost: cost(i..j) = Σ c_t·(v_j − v_t)
    csum = np.concatenate([[0], np.cumsum(counts)])
    cvsum = np.concatenate([[0], np.cumsum(counts * vals)])

    def kof(j):
        # bucket K rounded UP to a multiple of 8: the (n, K) layout is
        # sublane-tiled — hardware-measured, unaligned K is a net LOSS
        # (odd-K DP grid: 130 ms vs pow2's 86 ms at the bench shape
        # despite 25% less padding).  With ``k_small`` a single sub-8
        # width is additionally allowed for the lowest-degree group
        # (low-avg-degree graphs otherwise pad deg-1..4 nodes 2-8×).
        v = int(vals[j])
        if _K_SMALL:
            ladder = ((_K_SMALL,) if isinstance(_K_SMALL, int)
                      else tuple(_K_SMALL))
            for s in sorted(ladder):
                if v <= s:
                    return s
        return -(-v // 8) * 8

    def gcost(i, j):   # values i..j inclusive into one bucket
        return kof(j) * (csum[j + 1] - csum[i]) - (cvsum[j + 1] - cvsum[i])

    INF = float("inf")
    dp = np.full((b_max + 1, m), INF)
    parent = np.full((b_max + 1, m), -1, np.int64)
    for j in range(m):
        dp[1, j] = gcost(0, j)
    for b in range(2, b_max + 1):
        for j in range(b - 1, m):
            best, arg = INF, -1
            for i in range(b - 2, j):
                c = dp[b - 1, i] + gcost(i + 1, j)
                if c < best:
                    best, arg = c, i
            dp[b, j] = best
            parent[b, j] = arg
    best_b = int(np.argmin(dp[1:, m - 1])) + 1
    # walk back the group boundaries; each group's K = its max degree
    ks = []
    j, b = m - 1, best_b
    while j >= 0:
        ks.append(kof(j))
        j = int(parent[b, j]) if b > 1 else -1
        b -= 1
    ks = np.unique(np.array(ks, np.int64))
    # bucket of degree d = smallest group K ≥ d
    d = np.arange(k_cap + 1)
    bucket_of = ks[np.minimum(np.searchsorted(ks, d), len(ks) - 1)]
    return bucket_of


def build_ell(src_sorted: np.ndarray, dst_sorted: np.ndarray,
              w_sorted: np.ndarray, n_nodes: int,
              k_cap: int = K_CAP,
              max_buckets: int = MAX_BUCKETS,
              with_epos: bool = False,
              edge_ids: np.ndarray | None = None) -> EllMeta:
    """Host-side layout build from a dst-sorted COO triple.

    Vectorized (no per-node Python loop): per bucket, slot positions
    are filled with a flat repeat/cumsum construction.  With
    ``with_epos`` each slot also records its edge id (``edge_ids``
    translates positions in this call's ordering to the caller's
    canonical edge ids — used by the transpose layout), enabling
    ell_reweight for epoch-level dynamic weights."""
    src_sorted = np.asarray(src_sorted, np.int32)
    dst_sorted = np.asarray(dst_sorted, np.int64)
    w_sorted = np.asarray(w_sorted, np.float32)
    deg = np.bincount(dst_sorted, minlength=n_nodes)
    rowptr = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(deg, out=rowptr[1:])
    # per-node bucket K: DP-chosen grid over capped degrees
    per_vrow = np.minimum(np.maximum(deg, 1), k_cap)
    bucket_of = _bucket_grid(per_vrow[deg > 0], k_cap, max_buckets)
    kb = np.maximum(bucket_of[per_vrow], 1)
    n_vrows = -(-deg // kb)      # 0 for isolated nodes

    n_edges = len(src_sorted)
    idxs, ws, vnodes, eposs = [], [], [], []
    for K in np.unique(kb[deg > 0]):
        sel = np.where((kb == K) & (deg > 0))[0]
        vr = n_vrows[sel]
        tot = int(vr.sum())
        idx = np.zeros((tot, K), np.int32)
        ww = np.zeros((tot, K), np.float32)
        vnode = np.repeat(sel, vr).astype(np.int32)
        # edge range of each virtual row: node start + vrow_index·K
        starts = np.repeat(rowptr[sel], vr) + (
            np.arange(tot) - np.repeat(np.cumsum(vr) - vr, vr)) * K
        ends = np.minimum(starts + K, np.repeat(rowptr[sel + 1], vr))
        lens = (ends - starts).astype(np.int64)
        rows = np.repeat(np.arange(tot), lens)
        cols = np.arange(int(lens.sum())) - np.repeat(
            np.cumsum(lens) - lens, lens)
        epos = np.repeat(starts, lens) + cols
        idx[rows, cols] = src_sorted[epos]
        ww[rows, cols] = w_sorted[epos]
        idxs.append(idx)
        ws.append(ww)
        vnodes.append(vnode)
        if with_epos:
            # pad slots point one past the last edge (ell_reweight
            # appends a 0 there)
            ep = np.full((tot, K), n_edges, np.int32)
            canon = (edge_ids[epos] if edge_ids is not None
                     else epos.astype(np.int64))
            ep[rows, cols] = canon.astype(np.int32)
            eposs.append(ep)

    if vnodes:
        vnode_all = np.concatenate(vnodes)
    else:   # empty graph
        vnode_all = np.zeros((0,), np.int32)
    # combine plan: single-vrow nodes (deg ≤ K_CAP) read their bucket
    # output row directly; multi-vrow nodes (deg > K_CAP — rare) get a
    # tiny segment-sum; isolated nodes read the appended zero row
    order = np.argsort(vnode_all, kind="stable")
    n_vr_total = len(vnode_all)
    counts = n_vrows                      # per-node vrow count (0 = isolated)
    starts = np.cumsum(counts) - counts   # node's first vrow in sorted order
    single = counts == 1
    multi = counts > 1
    n_multi = int(multi.sum())
    node_src = np.full(n_nodes, n_vr_total + n_multi, np.int64)  # zero row
    node_src[single] = order[starts[single]]
    node_src[multi] = n_vr_total + np.arange(n_multi)
    if n_multi:
        mcounts = counts[multi]
        total_m = int(mcounts.sum())
        off = np.arange(total_m) - np.repeat(
            np.cumsum(mcounts) - mcounts, mcounts)
        mpos_sorted = np.repeat(starts[multi], mcounts) + off
        mgidx = jnp.asarray(order[mpos_sorted].astype(np.int32))
        msegs = jnp.asarray(
            np.repeat(np.arange(n_multi), mcounts).astype(np.int32))
    else:
        mgidx = msegs = None
    return EllMeta(tuple(jnp.asarray(a) for a in idxs),
                   tuple(jnp.asarray(a) for a in ws),
                   jnp.asarray(node_src.astype(np.int32)),
                   mgidx, msegs,
                   int(n_nodes), n_multi,
                   tuple(jnp.asarray(a) for a in eposs)
                   if with_epos else None)


def reweight_ws(meta: EllMeta, weight: jax.Array) -> tuple:
    """Just the re-gathered per-bucket slot-weight tuple (the piece
    models store in EXTRAS per epoch — layout statics stay in consts)."""
    assert meta.eposs is not None, "build_ell(..., with_epos=True) first"
    wpad = jnp.concatenate([weight.astype(jnp.float32),
                            jnp.zeros((1,), jnp.float32)])
    return tuple(wpad[ep] for ep in meta.eposs)


def with_ws(meta: EllMeta, ws: tuple) -> EllMeta:
    """EllMeta with replaced slot weights (shapes must match)."""
    return EllMeta(meta.idxs, ws, meta.node_src, meta.mgidx, meta.msegs,
                   meta.n_nodes, meta.n_multi, meta.eposs)


def ell_reweight(meta: EllMeta, weight: jax.Array) -> EllMeta:
    """New EllMeta whose slot weights come from ``weight`` (the
    graph's CANONICAL dst-sorted edge-weight array).  Device-side, one
    (E_pad,) scalar gather — cheap when amortized per epoch (SGL/SEPT
    re-augmentation).  Requires a layout built with ``with_epos``."""
    return with_ws(meta, reweight_ws(meta, weight))


def ell_spmm(meta: EllMeta, x: jax.Array) -> jax.Array:
    """out[d] = Σ_{e: dst[e]=d} w[e]·x[src[e]] via the bucketed-ELL
    layout.  No custom VJP here — callers in hot loops go through
    ops.spmm.spmm(), whose VJP runs the transpose as another ell_spmm
    over the reverse layout."""
    d = x.shape[-1]
    outs = [bucket_gather_sum(x, idx, w, d)
            for idx, w in zip(meta.idxs, meta.ws)]
    if not outs:
        return jnp.zeros((meta.n_nodes, d), x.dtype)
    pool = outs
    if meta.n_multi:
        vr = jnp.concatenate(outs, axis=0)
        msums = jax.ops.segment_sum(vr[meta.mgidx], meta.msegs,
                                    num_segments=meta.n_multi,
                                    indices_are_sorted=True)
        pool = [vr, msums]
    pool = pool + [jnp.zeros((1, d), x.dtype)]
    return jnp.concatenate(pool, axis=0)[meta.node_src]


def bucket_gather_sum(x, idx, w, d):
    """One bucket's gather+einsum with the production BUCKET_BYTES_BUDGET
    row-chunking (factored out of ell_spmm so probes time the exact
    production kernel — ADVICE r3)."""
    n_b, k = idx.shape
    bytes_b = n_b * k * d * 4
    if bytes_b <= BUCKET_BYTES_BUDGET:
        return _bucket_sum(x, idx, w, d)
    # static row-chunked accumulation: bound the transient
    # (rows, K, D) message block
    rows_per = max(1, BUCKET_BYTES_BUDGET // (k * d * 4))
    parts = []
    for lo in range(0, n_b, rows_per):
        hi = min(lo + rows_per, n_b)
        parts.append(_bucket_sum(x, idx[lo:hi], w[lo:hi], d))
    return jnp.concatenate(parts, axis=0)


def _bucket_sum(x, idx, w, d):
    n_b, k = idx.shape
    g = x[idx.reshape(-1)].reshape(n_b, k, d)
    return jnp.einsum("nkd,nk->nd", g, w.astype(x.dtype))
