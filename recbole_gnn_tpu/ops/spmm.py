"""Sparse adjacency × dense feature products (SpMM) — the hot kernel.

TPU-native replacement for torch_sparse.matmul / torch.spmm (reference:
recbole_gnn/model/layers.py:19-20, lightgcl.py:119-142).  The graph is a
*static* COO triple sorted by destination row, built once on host; the
compute path is a gather + sorted segment-sum, which XLA vectorizes
well, with an optional Pallas kernel (ops/pallas_spmm.py) for the
padded block-CSR layout.

Design notes (TPU-first):
  * static nnz — edge dropout / augmentation zero weights instead of
    resizing (SURVEY.md §7.3), so every jit trace sees one shape;
  * dst-sorted edges → ``indices_are_sorted=True`` segment sums;
  * weights broadcast over the feature dim so the multiply fuses into
    the gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Graph(NamedTuple):
    """Static COO graph, edges sorted by ``dst``.

    This is a pytree (NamedTuple of arrays), so it can be passed
    straight through ``jax.jit`` / ``shard_map`` boundaries.

    Attributes:
      src: (E,) int32 source node per edge.
      dst: (E,) int32 destination node per edge, non-decreasing.
      weight: (E,) float32 edge weight (0.0 == masked/padding edge).
      n_nodes: () int — number of destination nodes (static python int
        is kept separately; stored as 0-d array for pytree flatness).
    """

    src: jax.Array
    dst: jax.Array
    weight: jax.Array
    n_nodes: int

    @property
    def n_edges(self) -> int:
        return self.src.shape[0]

    def reverse(self) -> "Graph":
        """Transpose: edges flipped, re-sorted by new dst (host-side)."""
        src = np.asarray(self.src)
        dst = np.asarray(self.dst)
        w = np.asarray(self.weight)
        order = np.argsort(src, kind="stable")
        return Graph(
            src=jnp.asarray(dst[order]),
            dst=jnp.asarray(src[order]),
            weight=jnp.asarray(w[order]),
            n_nodes=self.n_nodes,
        )

    def with_weight(self, weight: jax.Array) -> "Graph":
        return self._replace(weight=weight)


def build_graph(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
                n_nodes: int, sort: bool = True) -> Graph:
    """Host-side constructor: sorts edges by dst for the sorted fast path."""
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    weight = np.asarray(weight, dtype=np.float32)
    if sort:
        order = np.argsort(dst, kind="stable")
        src, dst, weight = src[order], dst[order], weight[order]
    return Graph(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(weight),
                 int(n_nodes))


def spmm_coo(src: jax.Array, dst: jax.Array, weight: jax.Array,
             x: jax.Array, n_out: int,
             indices_are_sorted: bool = True) -> jax.Array:
    """out[d] = Σ_{e: dst[e]=d} weight[e] · x[src[e]].

    Gather-multiply-segment-sum; the multiply fuses into the gather
    under XLA so the op is HBM-bandwidth bound on (E × D) reads.
    """
    msgs = x[src] * weight[:, None].astype(x.dtype)
    return jax.ops.segment_sum(msgs, dst, num_segments=n_out,
                               indices_are_sorted=indices_are_sorted)


def spmm(graph: Graph, x: jax.Array, n_out: int | None = None) -> jax.Array:
    """SpMM over a :class:`Graph` (dst-sorted static COO)."""
    if n_out is None:
        n_out = graph.n_nodes
    return spmm_coo(graph.src, graph.dst, graph.weight, x, n_out,
                    indices_are_sorted=True)
