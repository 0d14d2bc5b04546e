"""Distributed full-catalog top-k — shard items, merge local winners.

The EP-analog build obligation from SURVEY.md §2.7: full-sort scoring
at web scale shards the item embedding table over the mesh, computes a
local top-k per shard, and merges the (n_shards × k) candidates — the
global top-k is always contained in the union of per-shard top-ks.

Implemented with shard_map so the collective (all-gather of the tiny
candidate sets, not the scores) rides ICI.  History masking happens
*inside* the shard: each shard scatters only its slice of the mask, so
neither the (B, n_items) score matrix nor a (B, n_items) mask ever
exists on one chip (at gowalla scale those are 20 GB / 5 GB per batch).
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
                               history: jax.Array, k: int,
                               mesh: Mesh, axis: str = "tp",
                               n_valid_items: int | None = None
                               ) -> tuple[jax.Array, jax.Array]:
    """(values, indices) of the global top-k over item-sharded scoring.

    Args:
      user_emb: (B, D), replicated over ``axis``.
      item_emb: (n_items, D), row-sharded over ``axis`` (n_items must
        divide evenly; pad the catalog with PAD rows otherwise).
      history: (B, H) int — per-user item ids to exclude (train
        positives; include id 0 to drop the PAD item).  Ids outside a
        shard's row range are dropped by that shard's scatter.
      k: cut.
      n_valid_items: real catalog size; rows in [n_valid_items,
        n_items) (padding to the shard multiple) are masked everywhere.
    """
    n_items = item_emb.shape[0]
    n_shards = mesh.shape[axis]
    assert n_items % n_shards == 0, "pad the catalog to the shard count"
    shard_size = n_items // n_shards
    n_valid = n_items if n_valid_items is None else int(n_valid_items)

    def local(u, i_shard, h):
        # u: (B, D) replicated; i_shard: (n_items/s, D); h: (B, H)
        B = u.shape[0]
        scores = jnp.dot(u, i_shard.T, preferred_element_type=jnp.float32)
        shard_id = jax.lax.axis_index(axis)
        rows = jnp.arange(B)[:, None]
        h_local = h - shard_id * shard_size
        # out-of-shard ids → the OOB-high sentinel (negative indices
        # would WRAP under numpy semantics before mode="drop" applies)
        h_local = jnp.where(
            (h_local >= 0) & (h_local < shard_size), h_local, shard_size)
        mask = jnp.zeros((B, shard_size), dtype=bool)
        mask = mask.at[rows, h_local].set(True, mode="drop")
        if n_valid < n_items:
            col_global = shard_id * shard_size + jnp.arange(shard_size)
            mask = mask | (col_global >= n_valid)[None, :]
        scores = jnp.where(mask, -1e30, scores)
        from recbole_gnn_tpu.ops.topk import masked_topk
        v, idx = masked_topk(scores, k)   # grouped cut on big shards
        gidx = idx + shard_id * shard_size
        # all-gather the small candidate sets and merge
        v_all = jax.lax.all_gather(v, axis, axis=0)      # (s, B, k)
        g_all = jax.lax.all_gather(gidx, axis, axis=0)
        v_cat = jnp.swapaxes(v_all, 0, 1).reshape(B, -1)
        g_cat = jnp.swapaxes(g_all, 0, 1).reshape(B, -1)
        vm, im = jax.lax.top_k(v_cat, k)
        return vm, jnp.take_along_axis(g_cat, im, axis=1)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P()),
        out_specs=(P(), P()), check_vma=False)
    return fn(user_emb, item_emb, history)
