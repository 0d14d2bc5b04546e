"""Ranking metrics @k — Recall / MRR / NDCG / Hit / Precision.

Reimplements the metric semantics the reference inherits from RecBole's
evaluator ([recbole] recbole/evaluator/metrics.py, configured via
``metrics``/``topk`` keys — SURVEY.md §5 "Metrics"):

  Hit@k        1 if any positive ranked in top-k
  Recall@k     |topk ∩ pos| / |pos|
  Precision@k  |topk ∩ pos| / k
  MRR@k        1 / rank of the first positive in top-k (0 if absent)
  NDCG@k       DCG@k / IDCG@k, binary relevance,
               DCG = Σ_{i: rel} 1/log2(i+1), ideal = min(|pos|, k) front-loaded

All computed from the top-k *indices* + per-user positive sets, vectorized;
jit-safe with static k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


METRIC_NAMES = ("recall", "mrr", "ndcg", "hit", "precision")


def relevance_at_k(topk_idx: jax.Array, pos_items: jax.Array,
                   pos_len: jax.Array) -> jax.Array:
    """(B, k) binary relevance: topk_idx[b, i] ∈ pos_items[b, :pos_len[b]].

    ``pos_items`` is a 0-padded (B, P) int array; index 0 is the global
    PAD item and never appears in top-k (scorers mask it to -inf).
    """
    valid = (jnp.arange(pos_items.shape[1])[None, :] < pos_len[:, None])
    pos = jnp.where(valid, pos_items, -1)
    return (topk_idx[:, :, None] == pos[:, None, :]).any(axis=-1)


def topk_metrics(topk_idx: jax.Array, pos_items: jax.Array,
                 pos_len: jax.Array, ks: tuple[int, ...]) -> dict[str, jax.Array]:
    """Per-user metric values for each cut in ``ks``.

    Returns {f"{name}@{k}": (B,) float array}.  Users with pos_len == 0
    contribute zeros — callers should exclude them from the average
    (the data pipeline never emits them).
    """
    rel = relevance_at_k(topk_idx, pos_items, pos_len).astype(jnp.float32)
    ranks = jnp.arange(1, topk_idx.shape[1] + 1, dtype=jnp.float32)
    discounts = 1.0 / jnp.log2(ranks + 1.0)
    safe_len = jnp.maximum(pos_len, 1).astype(jnp.float32)

    out: dict[str, jax.Array] = {}
    for k in ks:
        rel_k = rel[:, :k]
        hits_k = rel_k.sum(axis=1)
        out[f"recall@{k}"] = hits_k / safe_len
        out[f"hit@{k}"] = (hits_k > 0).astype(jnp.float32)
        out[f"precision@{k}"] = hits_k / float(k)
        # MRR: first relevant position
        first = jnp.argmax(rel_k, axis=1)
        has = rel_k.max(axis=1) > 0
        out[f"mrr@{k}"] = jnp.where(has, 1.0 / (first + 1.0), 0.0)
        # NDCG with binary relevance
        dcg = (rel_k * discounts[None, :k]).sum(axis=1)
        ideal_len = jnp.minimum(pos_len, k)
        # idcg[b] = Σ_{i<ideal_len[b]} discounts[i]
        cum = jnp.cumsum(discounts[:k])
        idcg = jnp.where(ideal_len > 0, cum[jnp.maximum(ideal_len - 1, 0)], 1.0)
        out[f"ndcg@{k}"] = jnp.where(pos_len > 0, dcg / idcg, 0.0)
    return out
