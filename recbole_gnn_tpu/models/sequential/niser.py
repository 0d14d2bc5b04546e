"""NISER+ — normalized item/session representations over SR-GNN.

Parity target: reference niser.py — item-embedding dropout +
L2-normalized node embeddings before propagation, positional
embeddings added to seq states, normalized session output, σ-scaled
logits on normalized item embeddings (:64-110).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import split_keys, uniform_pm
from recbole_gnn_tpu.models.layers import srgnn_cell_params
from recbole_gnn_tpu.models.losses import bpr_loss, cross_entropy
from recbole_gnn_tpu.models.sequential.common import (
    gather_seq_hidden, last_hidden, node_embeddings, seq_mask,
    session_dense_adj, srgnn_attention_readout, srgnn_cell_dense,
    srgnn_readout_params)


def _l2norm(x):
    from recbole_gnn_tpu.models.init import l2_normalize
    return l2_normalize(x)


class NISER(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.step = int(config.get("step", 1))
        self.sigma = float(config.get("sigma", 16.0))
        self.item_dropout = float(config.get("item_dropout", 0.1))
        self.loss_type = str(config["loss_type"] or "CE")

    def init_params(self, rng):
        stdv = 1.0 / math.sqrt(self.embedding_size)
        k1, k2, k3, k4 = split_keys(rng, 4)
        return {
            "item_emb": uniform_pm(k1, (self.n_items, self.embedding_size), stdv),
            "pos_emb": uniform_pm(k2, (self.max_seq_len, self.embedding_size), stdv),
            "cell": srgnn_cell_params(k3, self.embedding_size),
            "readout": srgnn_readout_params(k4, self.embedding_size, stdv),
        }

    def seq_output(self, params, batch, rng, train):
        hidden = node_embeddings(params["item_emb"], batch)
        if train and self.item_dropout > 0:
            keep = jax.random.bernoulli(rng, 1.0 - self.item_dropout,
                                        hidden.shape)
            hidden = jnp.where(keep, hidden / (1.0 - self.item_dropout), 0.0)
        hidden = _l2norm(hidden)
        a_in, a_out = session_dense_adj(batch)
        for _ in range(self.step):
            hidden = srgnn_cell_dense(params["cell"], hidden, a_in, a_out)
        seq_hidden = gather_seq_hidden(hidden, batch)
        L = seq_hidden.shape[1]
        seq_hidden = seq_hidden + params["pos_emb"][None, :L, :]
        ht = last_hidden(seq_hidden, batch["item_seq_len"])
        out = srgnn_attention_readout(params["readout"], seq_hidden, ht,
                                      seq_mask(batch))
        return _l2norm(out)

    def full_scores(self, params, consts, extras, batch, rng, train):
        out = self.seq_output(params, batch, rng, train)
        items = _l2norm(params["item_emb"])
        return self.sigma * jnp.dot(out, items.T,
                                    preferred_element_type=jnp.float32)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        w = batch.get("weight")
        if self.loss_type == "BPR":
            out = self.seq_output(params, batch, rng, True)
            pos_e = _l2norm(params["item_emb"][batch["item_id"]])
            neg_e = _l2norm(params["item_emb"][batch["neg_item_id"]])
            loss = bpr_loss(self.sigma * jnp.sum(out * pos_e, -1),
                            self.sigma * jnp.sum(out * neg_e, -1), w)
        else:
            logits = self.full_scores(params, consts, extras, batch, rng, True)
            loss = cross_entropy(logits, batch["item_id"], w)
        return loss, {"loss": loss}
