"""Shared session-graph machinery — dense batched form.

TPU-first redesign of the reference's per-batch disjoint-union graphs
(reference: recbole_gnn/data/transform.py:21-54 + PyG segment ops):
session graphs have ≤ L = MAX_ITEM_LIST_LENGTH nodes, so each batch
carries dense per-session adjacencies (B, L, L) and every propagation
step is ONE batched MXU matmul (einsum 'bij,bjd->bid') — no scatter,
no segment ops, fully static shapes.  The dense adjacency is built on
device from the dataset's padded edge arrays (data/session.py) with a
single small scatter per batch.

Semantics parity: A_in row-normalized over *distinct* in-neighbors =
PyG mean aggregation over deduped edges (reference SRGNNConv,
layers.py:69-79); A_out is the same for reversed edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.init import linear


def node_embeddings(item_emb: jax.Array, batch) -> jax.Array:
    """(B, L, D) embeddings of the per-session node slots (PAD slot→row 0,
    which models must mask; padding_idx=0 zeroing is applied)."""
    x = batch["x"]
    h = item_emb[x]
    return jnp.where((x > 0)[:, :, None], h, 0.0)


def seq_mask(batch) -> jax.Array:
    """(B, L) bool — valid sequence positions."""
    L = batch["alias_inputs"].shape[1]
    return jnp.arange(L)[None, :] < batch["item_seq_len"][:, None]


def node_mask(batch) -> jax.Array:
    """(B, L) bool — valid node slots."""
    L = batch["x"].shape[1]
    return jnp.arange(L)[None, :] < batch["n_nodes"][:, None]


def session_dense_adj(batch) -> tuple[jax.Array, jax.Array]:
    """(A_in, A_out): (B, L, L) row-normalized dense session adjacencies.

    A_in[b, i, j] = 1/in_deg(i) where a deduped consecutive-pair edge
    j→i exists; A_out is the reverse direction."""
    src, dst = batch["edge_src"], batch["edge_dst"]
    B, E = src.shape
    L = batch["x"].shape[1]
    evalid = jnp.arange(E)[None, :] < batch["n_edges"][:, None]
    rows = jnp.repeat(jnp.arange(B), E).reshape(B, E)
    ones = evalid.astype(jnp.float32)
    a = jnp.zeros((B, L, L)).at[rows, dst, src].max(ones)
    a_t = jnp.swapaxes(a, 1, 2)

    def row_norm(m):
        deg = m.sum(axis=-1, keepdims=True)
        return m / jnp.maximum(deg, 1.0)

    return row_norm(a), row_norm(a_t)


def srgnn_cell_dense(p: dict, hidden: jax.Array, a_in: jax.Array,
                     a_out: jax.Array) -> jax.Array:
    """SRGNN gated cell on dense batched session graphs (semantics:
    reference SRGNNCell, layers.py:82-114 — dual mean-aggr linear convs
    + GRU-style gate)."""
    input_in = jnp.einsum("bij,bjd->bid", a_in, linear(p["in_conv"], hidden))
    input_out = jnp.einsum("bij,bjd->bid", a_out, linear(p["out_conv"], hidden))
    inputs = jnp.concatenate([input_in, input_out], axis=-1)
    gi = linear(p["lin_ih"], inputs)
    gh = linear(p["lin_hh"], hidden)
    i_r, i_i, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_i, h_n = jnp.split(gh, 3, axis=-1)
    reset = jax.nn.sigmoid(i_r + h_r)
    update = jax.nn.sigmoid(i_i + h_i)
    new = jnp.tanh(i_n + reset * h_n)
    return (1.0 - update) * hidden + update * new


@jax.custom_vjp
def gather_slots(hidden: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, L_out, D) = hidden[b, idx[b, l], :] — slot gather with a
    matmul transpose.

    Forward is an EXACT take_along_axis (an earlier r4 form ran the
    forward as a one-hot einsum, which on TPU rides the default
    bf16-class matmul precision and silently rounded f32 states —
    review finding).  Backward scatters the cotangent through a
    one-hot MATMUL at HIGHEST precision instead of letting autodiff
    emit an XLA scatter into (B, L, D) — the scatter dominated the
    LESSR/SRGNN-family train step (23 of 46 ms at diginetica scale,
    scripts/diag/r4_lessr_ab.py ablation)."""
    return jnp.take_along_axis(hidden, idx[:, :, None], axis=1)


def _gather_slots_fwd(hidden, idx):
    return gather_slots(hidden, idx), (idx, hidden.shape[1])


def _gather_slots_bwd(res, g):
    idx, n_slots = res
    oh = jax.nn.one_hot(idx, n_slots, dtype=g.dtype)     # (B, L_out, S)
    gx = jnp.einsum("bls,bld->bsd", oh, g,
                    precision=jax.lax.Precision.HIGHEST)
    return gx, None


gather_slots.defvjp(_gather_slots_fwd, _gather_slots_bwd)


def gather_seq_hidden(hidden: jax.Array, batch) -> jax.Array:
    """(B, L, D) node states re-scattered to sequence positions via
    alias_inputs (reference srgnn.py:95) — exact gather forward,
    matmul backward (gather_slots)."""
    return gather_slots(hidden, batch["alias_inputs"])


def last_hidden(seq_hidden: jax.Array, item_seq_len: jax.Array) -> jax.Array:
    """(B, D) state at the last valid position."""
    idx = jnp.maximum(item_seq_len - 1, 0)
    return jnp.take_along_axis(seq_hidden, idx[:, None, None], axis=1)[:, 0]


def srgnn_attention_readout(p: dict, seq_hidden: jax.Array, ht: jax.Array,
                            mask: jax.Array) -> jax.Array:
    """Soft-attention session readout (reference srgnn.py:96-101):
    α = w₃·σ(W₁ht + W₂h_p); s = Σ α·h_p·mask; out = W₄[s; ht]."""
    q1 = linear(p["linear_one"], ht)[:, None, :]
    q2 = linear(p["linear_two"], seq_hidden)
    alpha = linear(p["linear_three"], jax.nn.sigmoid(q1 + q2))
    a = jnp.sum(alpha * seq_hidden * mask[:, :, None].astype(seq_hidden.dtype),
                axis=1)
    return linear(p["linear_transform"], jnp.concatenate([a, ht], axis=-1))


def srgnn_readout_params(rng, d, stdv):
    from recbole_gnn_tpu.models.init import linear_params, split_keys
    k1, k2, k3, k4 = split_keys(rng, 4)
    return {
        "linear_one": linear_params(k1, d, d, stdv=stdv),
        "linear_two": linear_params(k2, d, d, stdv=stdv),
        "linear_three": linear_params(k3, d, 1, bias=False, stdv=stdv),
        "linear_transform": linear_params(k4, 2 * d, d, stdv=stdv),
    }
