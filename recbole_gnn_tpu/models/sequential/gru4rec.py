"""GRU4Rec — GRU session encoder (RecBole-fallback baseline).

Semantics: [recbole] recbole/model/sequential_recommender/gru4rec.py —
item embedding → dropout → stacked GRU → dense back to embedding size,
state at the last valid position scores the catalog.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import linear, linear_params, split_keys, \
    xavier_normal, xavier_uniform
from recbole_gnn_tpu.models.layers import gru_params, gru_scan
from recbole_gnn_tpu.models.losses import bpr_loss, cross_entropy


class GRU4Rec(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.hidden_size = int(config.get("hidden_size", 128))
        self.num_layers = int(config.get("num_layers", 1))
        self.dropout_prob = float(config.get("dropout_prob", 0.3))
        self.loss_type = str(config["loss_type"] or "CE")

    def init_params(self, rng):
        ks = split_keys(rng, 2 + self.num_layers)
        grus = []
        d_in = self.embedding_size
        for i in range(self.num_layers):
            grus.append(gru_params(ks[2 + i], d_in, self.hidden_size))
            d_in = self.hidden_size
        return {
            "item_emb": xavier_normal(
                ks[0], (self.n_items, self.embedding_size)),
            "gru": grus,
            "dense": linear_params(ks[1], self.hidden_size,
                                   self.embedding_size, init=xavier_uniform),
        }

    def seq_output(self, params, batch, rng, train):
        seq = batch["item_seq"]
        mask = seq > 0
        h = params["item_emb"][seq]
        if train and self.dropout_prob > 0:
            rng, k = jax.random.split(rng)
            keep = jax.random.bernoulli(k, 1.0 - self.dropout_prob, h.shape)
            h = jnp.where(keep, h / (1.0 - self.dropout_prob), 0.0)
        for gp in params["gru"]:
            h0 = jnp.zeros((h.shape[0], self.hidden_size))
            h, _ = gru_scan(gp, h, h0, mask=mask)
        idx = jnp.maximum(batch["item_seq_len"] - 1, 0)
        last = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        return linear(params["dense"], last)

    def full_scores(self, params, consts, extras, batch, rng, train):
        out = self.seq_output(params, batch, rng, train)
        return jnp.dot(out, params["item_emb"].T,
                       preferred_element_type=jnp.float32)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        w = batch.get("weight")
        if self.loss_type == "BPR":
            out = self.seq_output(params, batch, rng, True)
            loss = bpr_loss(
                jnp.sum(out * params["item_emb"][batch["item_id"]], -1),
                jnp.sum(out * params["item_emb"][batch["neg_item_id"]], -1), w)
        else:
            logits = self.full_scores(params, consts, extras, batch, rng, True)
            loss = cross_entropy(logits, batch["item_id"], w)
        return loss, {"loss": loss}
