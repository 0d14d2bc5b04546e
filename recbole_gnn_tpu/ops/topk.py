"""Full-catalog scoring + top-k — memory-safe and shardable.

Replaces the reference's full-sort eval matmul + RecBole topk gather
(reference: recbole_gnn/model/general_recommender/lightgcn.py:123-133
and [recbole] full-sort convention).  The [B, n_items] logits are never
materialized for the whole eval set: we chunk over users, mask history
with -inf, and keep only top-k scores/indices per chunk.

For the distributed path see parallel/topk.py (per-shard top-k over
item shards + global merge).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# python float, NOT jnp.float32(...): a module-level device scalar
# initializes the JAX backend at import time, locking the platform
# before quick_start's use_gpu=False can switch to CPU
NEG_INF = float(np.float32(-1e30))


GROUPED_TOPK_MIN_N = 1 << 16    # catalogs above this use the 2-stage cut
GROUPED_TOPK_GROUP = 1 << 13


def masked_topk(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """EXACT top-k over the last axis.  Large catalogs route through
    XLA's ApproxTopK kernel pinned to ``recall_target=1.0`` — at that
    setting the reduction output size equals the input size
    (verified: ``approx_top_k_reduction_output_size(n, 2, k, 1.0)[0]
    == n``), i.e. NO approximation, but the PartialReduce-based
    aggregation is far faster than the general sort `lax.top_k`
    lowers to: hardware-measured at (256, 1.12M) f32, k=10 —
    grouped-8k cut 158 ms, this 18.4 ms, indices exactly equal
    (scripts/diag/r4_topk_probe, r4).  The r3 grouped two-stage cut
    (grouped_topk below) is kept for reference and as the fallback
    where ApproxTopK is unavailable."""
    n = scores.shape[-1]
    if n >= GROUPED_TOPK_MIN_N and k <= GROUPED_TOPK_GROUP:
        try:
            return jax.lax.approx_max_k(scores, k, recall_target=1.0)
        except NotImplementedError:  # backend without ApproxTopK
            return grouped_topk(scores, k)
    return jax.lax.top_k(scores, k)


def grouped_topk(scores: jax.Array, k: int,
                 group: int = GROUPED_TOPK_GROUP
                 ) -> tuple[jax.Array, jax.Array]:
    """Exact 2-stage top-k: per-group top-k, then top-k over the
    (G·k) candidates.  Padding scores are NEG_INF so they never win."""
    B, n = scores.shape
    pad = (-n) % group
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=NEG_INF)
    g = scores.shape[-1] // group
    s = scores.reshape(B, g, group)
    v1, i1 = jax.lax.top_k(s, k)                     # (B, G, k)
    gidx = i1 + (jnp.arange(g) * group)[None, :, None]
    cand_v = v1.reshape(B, g * k)
    cand_i = gidx.reshape(B, g * k)
    v, sel = jax.lax.top_k(cand_v, k)
    return v, jnp.take_along_axis(cand_i, sel, axis=1)


def full_sort_topk(user_emb: jax.Array, item_emb: jax.Array,
                   history_mask: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """scores = U @ Iᵀ with train-history masking, then top-k.

    Args:
      user_emb: (B, D) user vectors for this eval chunk.
      item_emb: (n_items, D) full catalog.
      history_mask: (B, n_items) bool — True where the item must be
        excluded (already-interacted), per RecBole's -inf convention.
      k: cut.
    Returns (values (B,k), indices (B,k)).
    """
    scores = jnp.dot(user_emb, item_emb.T, preferred_element_type=jnp.float32)
    scores = jnp.where(history_mask, NEG_INF, scores)
    return jax.lax.top_k(scores, k)


def chunked_full_sort_topk(user_emb: jax.Array, item_emb: jax.Array,
                           history_mask: jax.Array, k: int,
                           chunk: int = 1024) -> tuple[jax.Array, jax.Array]:
    """Scan over user chunks so peak memory is chunk × n_items."""
    n = user_emb.shape[0]
    pad = (-n) % chunk
    if pad:
        user_emb = jnp.pad(user_emb, ((0, pad), (0, 0)))
        history_mask = jnp.pad(history_mask, ((0, pad), (0, 0)),
                               constant_values=True)
    u = user_emb.reshape(-1, chunk, user_emb.shape[-1])
    m = history_mask.reshape(-1, chunk, history_mask.shape[-1])

    def body(carry, uc_mc):
        uc, mc = uc_mc
        v, i = full_sort_topk(uc, item_emb, mc, k)
        return carry, (v, i)

    _, (vals, idxs) = jax.lax.scan(body, None, (u, m))
    vals = vals.reshape(-1, k)[:n]
    idxs = idxs.reshape(-1, k)[:n]
    return vals, idxs
