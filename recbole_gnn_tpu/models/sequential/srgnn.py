"""SR-GNN — gated session-graph propagation + attention readout.

Parity target: reference srgnn.py — step× SRGNNCell over the session
graph (:86-94), alias re-scatter, last-state + soft-attention readout
(:95-101), CE over catalog or BPR (:103-122).  Dense batched form
(models/sequential/common.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import split_keys, uniform_pm
from recbole_gnn_tpu.models.layers import srgnn_cell_params
from recbole_gnn_tpu.models.losses import bpr_loss, cross_entropy
from recbole_gnn_tpu.models.sequential.common import (
    gather_seq_hidden, last_hidden, node_embeddings, seq_mask,
    session_dense_adj, srgnn_attention_readout, srgnn_cell_dense,
    srgnn_readout_params)


class SRGNN(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.step = int(config.get("step", 1))
        self.loss_type = str(config["loss_type"] or "CE")

    def init_params(self, rng):
        stdv = 1.0 / math.sqrt(self.embedding_size)
        k1, k2, k3 = split_keys(rng, 3)
        params = {
            "item_emb": uniform_pm(
                k1, (self.n_items, self.embedding_size), stdv),
            "cell": srgnn_cell_params(k2, self.embedding_size),
            "readout": srgnn_readout_params(k3, self.embedding_size, stdv),
        }
        return params

    def seq_output(self, params, batch):
        hidden = node_embeddings(params["item_emb"], batch)
        a_in, a_out = session_dense_adj(batch)
        for _ in range(self.step):
            hidden = srgnn_cell_dense(params["cell"], hidden, a_in, a_out)
        seq_hidden = gather_seq_hidden(hidden, batch)
        ht = last_hidden(seq_hidden, batch["item_seq_len"])
        return srgnn_attention_readout(params["readout"], seq_hidden, ht,
                                       seq_mask(batch))

    def full_scores(self, params, consts, extras, batch, rng, train):
        out = self.seq_output(params, batch)
        return jnp.dot(out, params["item_emb"].T,
                       preferred_element_type=jnp.float32)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        w = batch.get("weight")
        if self.loss_type == "BPR":
            out = self.seq_output(params, batch)
            pos_e = params["item_emb"][batch["item_id"]]
            neg_e = params["item_emb"][batch["neg_item_id"]]
            loss = bpr_loss(jnp.sum(out * pos_e, -1),
                            jnp.sum(out * neg_e, -1), w)
        else:
            logits = self.full_scores(params, consts, extras, batch, rng, True)
            loss = cross_entropy(logits, batch["item_id"], w)
        return loss, {"loss": loss}
