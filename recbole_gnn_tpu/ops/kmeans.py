"""Pure-JAX k-means — TPU-native replacement for faiss GPU k-means.

The reference's NCL model shells out to faiss.Kmeans for prototype
clustering of user/item embeddings (reference: recbole_gnn/model/
general_recommender/ncl.py:60-81).  Here: Lloyd iterations as
matmul-argmin (MXU) + segment-mean updates, fully jitted, k-means++-lite
(random) init, fixed iteration count for static control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _assign(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest centroid per row via ‖x-c‖² = ‖x‖² - 2x·c + ‖c‖² (MXU matmul)."""
    dots = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    return jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=-1)


def kmeans(rng: jax.Array, x: jax.Array, k: int, n_iter: int = 20
           ) -> tuple[jax.Array, jax.Array]:
    """Lloyd's k-means. Returns (centroids (k,D), assignments (N,)).

    Empty clusters keep their previous centroid (segment-mean guard),
    matching faiss's behavior closely enough for NCL's ProtoNCE use.
    """
    n = x.shape[0]
    init_idx = jax.random.choice(rng, n, shape=(k,), replace=False)
    centroids0 = x[init_idx]

    def step(centroids, _):
        assign = _assign(x, centroids)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), assign,
                                     num_segments=k)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0),
                        centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids0, None, length=n_iter)
    return centroids, _assign(x, centroids)
