"""Loss library — BPR / EmbLoss / InfoNCE / weighted CE.

Semantics match the [recbole] losses the reference imports
(recbole.model.loss — BPRLoss with gamma=1e-10, EmbLoss with the
require_pow branch) plus the contrastive losses individual models
define inline.  All take an optional per-row ``weight`` so padded
batch rows contribute nothing (loaders pad the last batch to keep
shapes static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _wmean(x: jax.Array, weight: jax.Array | None) -> jax.Array:
    if weight is None:
        return jnp.mean(x)
    return jnp.sum(x * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def _wsum(x: jax.Array, weight: jax.Array | None) -> jax.Array:
    if weight is None:
        return jnp.sum(x)
    return jnp.sum(x * weight)


def bpr_loss(pos_scores: jax.Array, neg_scores: jax.Array,
             weight: jax.Array | None = None,
             gamma: float = 1e-10) -> jax.Array:
    """-log(gamma + sigmoid(pos - neg)), mean ([recbole] BPRLoss)."""
    return _wmean(-jnp.log(gamma + jax.nn.sigmoid(pos_scores - neg_scores)),
                  weight)


def emb_loss(embeddings: list[jax.Array], batch_size: int | jax.Array,
             require_pow: bool = False, norm: int = 2,
             weight: jax.Array | None = None) -> jax.Array:
    """[recbole] EmbLoss: Σ‖e‖ₚ / B, or with require_pow Σ‖e‖ₚᵖ / p / B.

    ``weight`` zeroes padded rows inside each embedding (rows are the
    batch axis)."""
    if weight is not None:
        batch_size = jnp.maximum(jnp.sum(weight), 1.0)
    total = 0.0
    for e in embeddings:
        if weight is not None:
            e = e * weight.reshape((-1,) + (1,) * (e.ndim - 1))
        if require_pow:
            total = total + jnp.sum(jnp.abs(e) ** norm)
        else:
            total = total + jnp.sqrt(jnp.maximum(jnp.sum(e * e), 1e-24))
    if require_pow:
        total = total / norm
    return total / batch_size


def reg_loss_l2(params_leaves: list[jax.Array]) -> jax.Array:
    """Plain Σ‖W‖₂² over parameter tensors (LightGCL-style all-param reg)."""
    return sum(jnp.sum(p * p) for p in params_leaves)


def info_nce(view1: jax.Array, view2: jax.Array, temperature: float,
             weight: jax.Array | None = None,
             all_view2: jax.Array | None = None,
             reduction: str = "sum") -> jax.Array:
    """InfoNCE between aligned rows of two views.

    positive = cos-sim(view1ᵢ, view2ᵢ); negatives = all rows of
    ``all_view2`` (defaults to view2).  Views are L2-normalized inside,
    matching the reference models (sgl.py:176-209, simgcl.py:40-60).
    reduction 'sum' reproduces SGL/SimGCL sum-reduction; 'mean' is
    XSimGCL's."""
    v1 = view1 / jnp.maximum(jnp.linalg.norm(view1, axis=-1, keepdims=True), 1e-12)
    v2 = view2 / jnp.maximum(jnp.linalg.norm(view2, axis=-1, keepdims=True), 1e-12)
    av2 = v2 if all_view2 is None else all_view2 / jnp.maximum(
        jnp.linalg.norm(all_view2, axis=-1, keepdims=True), 1e-12)
    pos = jnp.sum(v1 * v2, axis=-1) / temperature
    logits = jnp.dot(v1, av2.T, preferred_element_type=jnp.float32) / temperature
    loss = jax.nn.logsumexp(logits, axis=-1) - pos
    if reduction == "sum":
        return _wsum(loss, weight)
    return _wmean(loss, weight)


def cross_entropy(logits: jax.Array, targets: jax.Array,
                  weight: jax.Array | None = None) -> jax.Array:
    """Mean CE over full-catalog logits (sequential family default)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return _wmean(nll, weight)
