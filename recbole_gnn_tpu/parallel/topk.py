"""Distributed full-catalog top-k — shard items, merge local winners.

The EP-analog build obligation from SURVEY.md §2.7: full-sort scoring
at web scale shards the item embedding table over the mesh, computes a
local top-k per shard, and merges the (n_shards × k) candidates — the
global top-k is always contained in the union of per-shard top-ks.

Implemented with shard_map so the collective (all-gather of the tiny
candidate sets, not the scores) rides ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def distributed_full_sort_topk(user_emb: jax.Array, item_emb: jax.Array,
                               history_mask: jax.Array, k: int,
                               mesh: Mesh, axis: str = "tp"
                               ) -> tuple[jax.Array, jax.Array]:
    """(values, indices) of the global top-k over item-sharded scoring.

    Args:
      user_emb: (B, D), replicated over ``axis``.
      item_emb: (n_items, D), row-sharded over ``axis`` (n_items must
        divide evenly; pad the catalog with PAD rows otherwise).
      history_mask: (B, n_items) bool, sharded like the score columns.
      k: cut.
    """
    n_items = item_emb.shape[0]
    n_shards = mesh.shape[axis]
    assert n_items % n_shards == 0, "pad the catalog to the shard count"
    shard_size = n_items // n_shards

    def local(u, i_shard, h_shard):
        # u: (B, D) replicated; i_shard: (n_items/s, D); h: (B, n/s)
        scores = jnp.dot(u, i_shard.T, preferred_element_type=jnp.float32)
        scores = jnp.where(h_shard, -1e30, scores)
        v, idx = jax.lax.top_k(scores, k)
        shard_id = jax.lax.axis_index(axis)
        gidx = idx + shard_id * shard_size
        # all-gather the small candidate sets and merge
        v_all = jax.lax.all_gather(v, axis, axis=0)      # (s, B, k)
        g_all = jax.lax.all_gather(gidx, axis, axis=0)
        v_cat = jnp.swapaxes(v_all, 0, 1).reshape(u.shape[0], -1)
        g_cat = jnp.swapaxes(g_all, 0, 1).reshape(u.shape[0], -1)
        vm, im = jax.lax.top_k(v_cat, k)
        return vm, jnp.take_along_axis(g_cat, im, axis=1)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(None, axis)),
        out_specs=(P(), P()), check_vma=False)
    return fn(user_emb, item_emb, history_mask)
