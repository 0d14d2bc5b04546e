"""TAGNN — target-aware attention over SR-GNN states.

Parity target: reference tagnn.py — SR-GNN propagation + softmaxed
position attention, then per-candidate target attention
β = softmax(E·W_t·hᵀ) and scores = Σ (s + target)·e (:62-87); forward
returns [B, n_items] scores directly; CE only; `predict` unimplemented
in the reference (:99-100) — candidate scoring here slices the full
score matrix.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import linear, linear_params, split_keys, \
    uniform_pm
from recbole_gnn_tpu.models.layers import srgnn_cell_params
from recbole_gnn_tpu.models.losses import cross_entropy
from recbole_gnn_tpu.models.sequential.common import (
    gather_seq_hidden, last_hidden, node_embeddings, seq_mask,
    session_dense_adj, srgnn_cell_dense, srgnn_readout_params)


class TAGNN(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.step = int(config.get("step", 1))
        self.loss_type = str(config["loss_type"] or "CE")
        if self.loss_type != "CE":
            raise NotImplementedError("TAGNN supports CE only")

    def init_params(self, rng):
        stdv = 1.0 / math.sqrt(self.embedding_size)
        k1, k2, k3, k4 = split_keys(rng, 4)
        return {
            "item_emb": uniform_pm(k1, (self.n_items, self.embedding_size), stdv),
            "cell": srgnn_cell_params(k2, self.embedding_size),
            "readout": srgnn_readout_params(k3, self.embedding_size, stdv),
            "linear_t": linear_params(k4, self.embedding_size,
                                      self.embedding_size, bias=False,
                                      stdv=stdv),
        }

    def full_scores(self, params, consts, extras, batch, rng, train):
        hidden = node_embeddings(params["item_emb"], batch)
        a_in, a_out = session_dense_adj(batch)
        for _ in range(self.step):
            hidden = srgnn_cell_dense(params["cell"], hidden, a_in, a_out)
        seq_hidden = gather_seq_hidden(hidden, batch)
        mask = seq_mask(batch)
        ht = last_hidden(seq_hidden, batch["item_seq_len"])

        p = params["readout"]
        q1 = linear(p["linear_one"], ht)[:, None, :]
        q2 = linear(p["linear_two"], seq_hidden)
        alpha = linear(p["linear_three"], jax.nn.sigmoid(q1 + q2))
        # softmax over ALL positions then masked sum (reference :75-76)
        alpha = jax.nn.softmax(alpha, axis=1)
        a = jnp.sum(alpha * seq_hidden * mask[:, :, None], axis=1)
        seq_output = linear(p["linear_transform"],
                            jnp.concatenate([a, ht], axis=-1))

        seq_hidden_m = seq_hidden * mask[:, :, None]
        qt = linear(params["linear_t"], seq_hidden_m)     # (B, L, D)
        b = params["item_emb"]                            # (n, D)
        beta = jax.nn.softmax(
            jnp.einsum("nd,bld->bnl", b, qt), axis=-1)    # (B, n, L)
        target = jnp.einsum("bnl,bld->bnd", beta, seq_hidden_m)
        scores = jnp.sum((seq_output[:, None, :] + target) * b[None, :, :],
                         axis=-1)
        return scores

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        logits = self.full_scores(params, consts, extras, batch, rng, True)
        loss = cross_entropy(logits, batch["item_id"], batch.get("weight"))
        return loss, {"ce": loss}
