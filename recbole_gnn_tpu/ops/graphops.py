"""Graph normalization + augmentation primitives.

TPU-native equivalents of PyG ``gcn_norm`` / ``degree`` / ``dropout_adj``
(reference: recbole_gnn/data/dataset.py:60-79, sgl.py:93-126,
ngcf.py:75-90).  Normalizations run once at graph build (device or
host); edge dropout keeps nnz static by zeroing weights instead of
resizing edge lists (jit-friendly — SURVEY.md §7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def degree(index: jax.Array, n_nodes: int,
           weight: jax.Array | None = None) -> jax.Array:
    """(Weighted) node degree from an edge endpoint array."""
    if weight is None:
        weight = jnp.ones(index.shape, dtype=jnp.float32)
    return jax.ops.segment_sum(weight, index, num_segments=n_nodes)


def sym_norm_weights(src: jax.Array, dst: jax.Array, n_nodes: int,
                     mask: jax.Array | None = None) -> jax.Array:
    """Symmetric GCN normalization D^{-1/2} A D^{-1/2} edge weights.

    Matches PyG ``gcn_norm(add_self_loops=False)`` as used by the
    reference's GeneralGraphDataset.get_norm_adj_mat (dataset.py:60-79).
    ``mask`` (bool per edge) supports static-nnz augmented graphs:
    masked edges get weight 0 and do not contribute to degrees.
    """
    ones = jnp.ones(src.shape, dtype=jnp.float32)
    if mask is not None:
        ones = ones * mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, dst, num_segments=n_nodes)
    deg_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    w = deg_inv_sqrt[src] * deg_inv_sqrt[dst]
    if mask is not None:
        w = w * mask.astype(jnp.float32)
    return w


def row_norm_weights(src: jax.Array, dst: jax.Array, n_nodes: int,
                     mask: jax.Array | None = None) -> jax.Array:
    """Row (1/in-degree of dst) normalization — D^{-1} A edge weights."""
    ones = jnp.ones(src.shape, dtype=jnp.float32)
    if mask is not None:
        ones = ones * mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, dst, num_segments=n_nodes)
    deg_inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
    w = deg_inv[dst]
    if mask is not None:
        w = w * mask.astype(jnp.float32)
    return w


def edge_dropout_mask(rng: jax.Array, n_edges: int, drop_ratio: float) -> jax.Array:
    """Bool keep-mask over edges; static shape (replaces dropout_adj).

    The caller re-normalizes with :func:`sym_norm_weights`/`row_norm_weights`
    passing this mask, reproducing the reference's resize-then-renormalize
    semantics (sgl.py:108-126) without dynamic shapes.
    """
    return jax.random.uniform(rng, (n_edges,)) >= drop_ratio


def node_dropout_edge_mask(rng: jax.Array, src: jax.Array, dst: jax.Array,
                           n_nodes: int, drop_ratio: float) -> jax.Array:
    """Bool keep-mask over edges induced by dropping nodes (SGL 'ND' aug)."""
    keep_node = jax.random.uniform(rng, (n_nodes,)) >= drop_ratio
    return keep_node[src] & keep_node[dst]
