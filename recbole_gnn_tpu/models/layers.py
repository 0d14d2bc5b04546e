"""Reusable GNN / sequence layers — functional, segment-op based.

TPU-native equivalents of the reference's layer library (reference:
recbole_gnn/model/layers.py:8-114) plus the [recbole] Transformer
encoder and GRU the sequential models import.  Every graph op bottoms
out in ops.spmm / ops.segment — no message-passing framework, just
gathers and sorted segment reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.init import linear, linear_params, split_keys
from recbole_gnn_tpu.ops.segment import segment_softmax
from recbole_gnn_tpu.ops.spmm import Graph, spmm, spmm_any


# -- LightGCN conv ------------------------------------------------------

def lightgcn_conv(graph, x: jax.Array) -> jax.Array:
    """Weighted add-aggregation over the normalized adjacency
    (reference LightGCNConv, layers.py:8-22): one SpMM — dense-MXU or
    sparse segment-sum per the graph representation."""
    return spmm_any(graph, x)


def lightgcn_propagate(graph, ego: jax.Array, n_layers: int,
                       include_ego: bool = True) -> list[jax.Array]:
    """K propagation steps; returns the per-layer embedding list
    [e⁰, e¹, …, e^K] (models differ in how they combine them)."""
    out = [ego] if include_ego else []
    h = ego
    for _ in range(n_layers):
        h = spmm_any(graph, h)
        out.append(h)
    return out


# -- Bi-interaction conv (NGCF) ----------------------------------------

def bignn_params(rng: jax.Array, d_in: int, d_out: int) -> dict:
    k1, k2 = split_keys(rng, 2)
    return {"lin1": linear_params(k1, d_in, d_out),
            "lin2": linear_params(k2, d_in, d_out)}


def bignn_conv(p: dict, graph: Graph, x: jax.Array) -> jax.Array:
    """(L+I)·E·W₁ + (L·E ⊙ E)·W₂ (reference BiGNNConv, layers.py:41-66)."""
    x_prop = spmm(graph, x)
    return linear(p["lin1"], x_prop + x) + linear(p["lin2"], x_prop * x)


# -- SRGNN gated cell ---------------------------------------------------

def srgnn_cell_params(rng: jax.Array, dim: int) -> dict:
    import math
    stdv = 1.0 / math.sqrt(dim)
    k1, k2, k3, k4 = split_keys(rng, 4)
    return {
        "in_conv": linear_params(k1, dim, dim, stdv=stdv),
        "out_conv": linear_params(k2, dim, dim, stdv=stdv),
        "lin_ih": linear_params(k3, 2 * dim, 3 * dim, stdv=stdv),
        "lin_hh": linear_params(k4, dim, 3 * dim, stdv=stdv),
    }


def srgnn_cell(p: dict, hidden: jax.Array, in_graph: Graph,
               out_graph: Graph) -> jax.Array:
    """Dual mean-aggregation convs (in-edges / reversed edges) feeding a
    GRU-style gate (reference SRGNNConv+SRGNNCell, layers.py:69-114).

    ``in_graph``/``out_graph`` carry row-normalized weights (mean
    aggregation) over the batch session graph; empty-in-degree nodes
    receive 0, matching PyG mean-aggr on isolated nodes."""
    input_in = spmm(in_graph, linear(p["in_conv"], hidden))
    input_out = spmm(out_graph, linear(p["out_conv"], hidden))
    inputs = jnp.concatenate([input_in, input_out], axis=-1)
    gi = linear(p["lin_ih"], inputs)
    gh = linear(p["lin_hh"], hidden)
    i_r, i_i, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_i, h_n = jnp.split(gh, 3, axis=-1)
    reset = jax.nn.sigmoid(i_r + h_r)
    update = jax.nn.sigmoid(i_i + h_i)
    new = jnp.tanh(i_n + reset * h_n)
    return (1.0 - update) * hidden + update * new


# -- GRU (for GRU4Rec / NARM / LESSR's EOP aggregation) -----------------

def gru_params(rng: jax.Array, d_in: int, d_hidden: int) -> dict:
    k1, k2 = split_keys(rng, 2)
    return {"ih": linear_params(k1, d_in, 3 * d_hidden),
            "hh": linear_params(k2, d_hidden, 3 * d_hidden)}


def gru_step(p: dict, h: jax.Array, x: jax.Array) -> jax.Array:
    gi = linear(p["ih"], x)
    gh = linear(p["hh"], h)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(p: dict, xs: jax.Array, h0: jax.Array,
             mask: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Run a GRU over the time axis of xs (B, T, D) with optional
    (B, T) validity mask (masked steps keep the previous state).

    Returns (all_states (B, T, H), last_state (B, H))."""

    def step(h, inp):
        x_t, m_t = inp
        h_new = gru_step(p, h, x_t)
        if m_t is not None:
            h_new = jnp.where(m_t[:, None], h_new, h)
        return h_new, h_new

    xs_t = jnp.swapaxes(xs, 0, 1)
    if mask is not None:
        ms_t = jnp.swapaxes(mask, 0, 1)
        last, states = jax.lax.scan(step, h0, (xs_t, ms_t))
    else:
        last, states = jax.lax.scan(
            lambda h, x: step(h, (x, None)), h0, xs_t)
    return jnp.swapaxes(states, 0, 1), last


# -- Transformer encoder (GCSAN / SASRec) -------------------------------

def transformer_params(rng: jax.Array, n_layers: int, n_heads: int,
                       d_model: int, d_ff: int) -> dict:
    layers = []
    keys = split_keys(rng, n_layers)
    for k in keys:
        kq, kk, kv, ko, k1, k2 = split_keys(k, 6)
        layers.append({
            "q": linear_params(kq, d_model, d_model),
            "k": linear_params(kk, d_model, d_model),
            "v": linear_params(kv, d_model, d_model),
            "o": linear_params(ko, d_model, d_model),
            "ff1": linear_params(k1, d_model, d_ff),
            "ff2": linear_params(k2, d_ff, d_model),
            "ln1": {"g": jnp.ones((d_model,)), "b": jnp.zeros((d_model,))},
            "ln2": {"g": jnp.ones((d_model,)), "b": jnp.zeros((d_model,))},
        })
    return {"layers": layers}


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def transformer_encoder(p: dict, x: jax.Array, attn_mask: jax.Array,
                        dropout_rng: jax.Array | None = None,
                        dropout: float = 0.0, n_heads: int = 1,
                        attn_dropout: float | None = None) -> jax.Array:
    """Post-LN transformer (the [recbole] TransformerEncoder layout used
    by GCSAN, gcsan.py:59-68).  ``attn_mask`` is (B, T, T) additive
    (0 keep / -inf drop); ``n_heads`` is static (not part of params).
    ``attn_dropout`` (defaults to ``dropout``) drops attention probs."""
    B, T, D = x.shape
    dh = D // n_heads
    if attn_dropout is None:
        attn_dropout = dropout

    def maybe_dropout(rng, h, rate):
        if dropout_rng is None or rate <= 0.0:
            return rng, h
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - rate, h.shape)
        return rng, jnp.where(keep, h / (1.0 - rate), 0.0)

    rng = dropout_rng
    for lp in p["layers"]:
        q = linear(lp["q"], x).reshape(B, T, n_heads, dh).transpose(0, 2, 1, 3)
        k = linear(lp["k"], x).reshape(B, T, n_heads, dh).transpose(0, 2, 1, 3)
        v = linear(lp["v"], x).reshape(B, T, n_heads, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(float(dh))
        scores = scores + attn_mask[:, None, :, :]
        attn = jax.nn.softmax(scores, axis=-1)
        if rng is not None:
            rng, attn = maybe_dropout(rng, attn, attn_dropout)
        ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
        h = linear(lp["o"], ctx)
        if rng is not None:
            rng, h = maybe_dropout(rng, h, dropout)
        x = layer_norm(lp["ln1"], x + h)
        # exact erf gelu — [recbole] FeedForward defines gelu as
        # x·Φ(x), not the tanh approximation jax defaults to
        ff = linear(lp["ff2"],
                    jax.nn.gelu(linear(lp["ff1"], x), approximate=False))
        if rng is not None:
            rng, ff = maybe_dropout(rng, ff, dropout)
        x = layer_norm(lp["ln2"], x + ff)
    return x


def causal_additive_mask(seq_len_mask: jax.Array) -> jax.Array:
    """(B, T) bool valid mask → (B, T, T) additive causal mask
    (matches GCSAN.get_attention_mask, gcsan.py:92-106)."""
    T = seq_len_mask.shape[1]
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    m = causal[None, :, :] & seq_len_mask[:, None, :]
    return jnp.where(m, 0.0, -1e9)


# -- attention readout over session nodes -------------------------------

def edge_attention(logits: jax.Array, dst: jax.Array, n_nodes: int,
                   mask: jax.Array | None = None) -> jax.Array:
    """Edge-softmax per destination node (PyG softmax / DGL
    edge_softmax equivalent)."""
    return segment_softmax(logits, dst, n_nodes, mask=mask)
