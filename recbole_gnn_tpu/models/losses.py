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


def _l2n(x):
    """Smooth L2 normalize (finite grad at 0; see models.init.l2_normalize)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)


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


# (B, n_all) InfoNCE denominators larger than this many score entries
# stream through a chunked logsumexp instead of materializing the
# logits: SGL's all-node negatives at gowalla scale would otherwise
# build an f32[4096, 1.12M] = 18 GiB buffer (compile-time OOM on a
# 16 GiB v5e — measured, scripts/diag/r4_sgl_gowalla.py)
_NCE_CHUNK_ENTRIES = 1 << 28


def _chunked_lse(v1: jax.Array, av2: jax.Array, tau: float) -> jax.Array:
    """Exact streaming logsumexp of v1 @ av2.T / tau over row-chunks of
    ``av2`` — running (max, sum·exp) carry; the per-chunk logits block
    stays ≤ ~1 GiB and jax.checkpoint keeps the backward from saving
    every block (it recomputes them from the tiny carries)."""
    B = v1.shape[0]
    n = av2.shape[0]
    rows = max(1024, _NCE_CHUNK_ENTRIES // max(1, B))
    rows = min(rows, n)
    pad = (-n) % rows
    av2p = jnp.pad(av2, ((0, pad), (0, 0)))
    valid = (jnp.arange(n + pad) < n).reshape(-1, rows)
    chunks = av2p.reshape(-1, rows, av2.shape[1])

    @jax.checkpoint
    def body(carry, cv):
        c, vmask = cv
        m, s = carry
        lg = jnp.dot(v1, c.T, preferred_element_type=jnp.float32) / tau
        lg = jnp.where(vmask[None, :], lg, -jnp.inf)
        cm = jnp.max(lg, axis=-1)
        nm = jnp.maximum(m, cm)
        s = s * jnp.exp(m - nm) + jnp.sum(jnp.exp(lg - nm[:, None]), -1)
        return (nm, s), None

    m0 = jnp.full((B,), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((B,), jnp.float32)
    (m, s), _ = jax.lax.scan(body, (m0, s0), (chunks, valid))
    return m + jnp.log(s)


def info_nce(view1: jax.Array, view2: jax.Array, temperature: float,
             weight: jax.Array | None = None,
             all_view2: jax.Array | None = None,
             reduction: str = "sum") -> jax.Array:
    """InfoNCE between aligned rows of two views.

    positive = cos-sim(view1ᵢ, view2ᵢ); negatives = all rows of
    ``all_view2`` (defaults to view2).  Views are L2-normalized inside,
    matching the reference models (sgl.py:176-209, simgcl.py:40-60).
    reduction 'sum' reproduces SGL/SimGCL sum-reduction; 'mean' is
    XSimGCL's.  Web-scale denominators stream through _chunked_lse —
    bit-compatible logsumexp, bounded memory."""
    v1 = _l2n(view1)
    v2 = _l2n(view2)
    av2 = v2 if all_view2 is None else _l2n(all_view2)
    pos = jnp.sum(v1 * v2, axis=-1) / temperature
    if v1.shape[0] * av2.shape[0] > _NCE_CHUNK_ENTRIES:
        lse = _chunked_lse(v1, av2, temperature)
    else:
        logits = jnp.dot(v1, av2.T,
                         preferred_element_type=jnp.float32) / temperature
        lse = jax.nn.logsumexp(logits, axis=-1)
    loss = lse - pos
    if reduction == "sum":
        return _wsum(loss, weight)
    return _wmean(loss, weight)


def cross_entropy(logits: jax.Array, targets: jax.Array,
                  weight: jax.Array | None = None) -> jax.Array:
    """Mean CE over full-catalog logits (sequential family default)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return _wmean(nll, weight)


def masked_unique(ids: jax.Array, size: int | None = None
                  ) -> tuple[jax.Array, jax.Array]:
    """Static-shape unique: (unique ids padded with 0, validity mask).

    The reference dedupes batch users/items before contrastive losses
    (simgcl.py:53-54); jnp.unique(size=…) keeps the shape static under
    jit, and id 0 (PAD, never in a batch) marks fill slots."""
    size = ids.shape[0] if size is None else size
    u = jnp.unique(ids, size=size, fill_value=0)
    return u, u > 0


def cl_nce_masked(view1: jax.Array, view2: jax.Array, temperature: float,
                  mask: jax.Array, reduction: str = "sum") -> jax.Array:
    """InfoNCE over masked rows: positives are aligned rows, negatives
    are the *other valid rows of view2* — exactly the reference's
    unique-batch CL (simgcl.py:40-47) with fill rows excluded from both
    numerator and denominator."""
    # substitute fill rows with ones BEFORE normalizing: masking only the
    # value leaves a 0/0 in the norm's backward (NaN·0 = NaN through where)
    view1 = jnp.where(mask[:, None], view1, 1.0)
    view2 = jnp.where(mask[:, None], view2, 1.0)
    v1 = _l2n(view1)
    v2 = _l2n(view2)
    pos = jnp.sum(v1 * v2, axis=-1) / temperature
    logits = jnp.dot(v1, v2.T, preferred_element_type=jnp.float32) / temperature
    logits = jnp.where(mask[None, :], logits, -1e30)
    loss = jax.nn.logsumexp(logits, axis=-1) - pos
    loss = jnp.where(mask, loss, 0.0)
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)


def batch_softmax_loss(user_emb: jax.Array, item_emb: jax.Array,
                       temperature: float,
                       weight: jax.Array | None = None) -> jax.Array:
    """In-batch sampled-softmax (SSL4REC rec loss, ssl4rec.py:50-57):
    positives on the diagonal, other batch items as negatives."""
    u = _l2n(user_emb)
    i = _l2n(item_emb)
    pos = jnp.sum(u * i, axis=-1) / temperature
    logits = jnp.dot(u, i.T, preferred_element_type=jnp.float32) / temperature
    if weight is not None:
        logits = jnp.where(weight[None, :] > 0, logits, -jnp.inf)
    loss = jax.nn.logsumexp(logits, axis=-1) - pos
    return _wmean(loss, weight)


def alignment_loss(x: jax.Array, y: jax.Array,
                   weight: jax.Array | None = None,
                   alpha: int = 2) -> jax.Array:
    """DirectAU alignment: mean ‖x−y‖₂^α over pairs (directau.py:54-56)."""
    d = jnp.sqrt(jnp.maximum(jnp.sum((x - y) ** 2, axis=-1), 1e-24)) ** alpha
    return _wmean(d, weight)


def uniformity_loss(x: jax.Array, weight: jax.Array | None = None,
                    t: float = 2.0) -> jax.Array:
    """DirectAU uniformity: log mean exp(−t·‖xᵢ−xⱼ‖²) over i<j pairs
    (directau.py:58-60, torch.pdist semantics)."""
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        x, x.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(d2, 0.0)
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    vals = jnp.exp(-t * d2[iu])
    if weight is not None:
        wpair = weight[iu[0]] * weight[iu[1]]
        mean = jnp.sum(vals * wpair) / jnp.maximum(jnp.sum(wpair), 1.0)
    else:
        mean = jnp.mean(vals)
    return jnp.log(jnp.maximum(mean, 1e-24))
