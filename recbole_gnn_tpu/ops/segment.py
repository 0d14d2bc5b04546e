"""Segment reductions — the TPU-native replacement for torch_scatter.

The reference's every PyG ``MessagePassing.propagate`` bottoms out in
torch_scatter's CUDA scatter-add/mean (reference: recbole_gnn/model/
layers.py, gcegnn.py:28-43).  On TPU the idiomatic equivalent is
``jax.ops.segment_*`` over edge arrays sorted by destination: XLA
lowers sorted segment reductions to efficient vectorized code, and the
same primitives back SpMM, edge-softmax and graph pooling.

All functions are jit-safe (static ``num_segments``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                indices_are_sorted: bool = False) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets given by ``segment_ids``."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                 indices_are_sorted: bool = False) -> jax.Array:
    """Mean-reduce rows per segment (empty segments → 0)."""
    totals = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    counts = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], dtype=data.dtype), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted)
    counts = jnp.maximum(counts, 1)
    return totals / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                indices_are_sorted: bool = False) -> jax.Array:
    """Max-reduce per segment (empty segments → dtype min)."""
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_softmax(logits: jax.Array, segment_ids: jax.Array,
                    num_segments: int, mask: jax.Array | None = None,
                    indices_are_sorted: bool = False) -> jax.Array:
    """Numerically-stable softmax within each segment.

    TPU-native equivalent of PyG's ``softmax(alpha, index)`` / DGL's
    ``edge_softmax`` (used by GCE-GNN local attention and LESSR SGAT).
    ``mask`` (bool per element) excludes padding edges: masked entries
    get probability 0 and do not contribute to the normalizer.
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    maxes = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    # Empty / fully-masked segments produce -inf maxes; guard them.
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    shifted = logits - maxes[segment_ids]
    exp = jnp.where(jnp.isfinite(shifted), jnp.exp(shifted), 0.0)
    denom = jax.ops.segment_sum(
        exp, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
