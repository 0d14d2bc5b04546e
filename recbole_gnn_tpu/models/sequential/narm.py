"""NARM — neural attentive session recommendation (fallback baseline).

Semantics: [recbole] recbole/model/sequential_recommender/narm.py —
GRU encoder; global representation = last hidden, local = attention
over hidden states queried by the last state (mask-gated sigmoid
energies), concat → dropout → bilinear projection to embedding space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import linear, linear_params, split_keys, \
    xavier_normal
from recbole_gnn_tpu.models.layers import gru_params, gru_scan
from recbole_gnn_tpu.models.losses import bpr_loss, cross_entropy


class NARM(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.hidden_size = int(config.get("hidden_size", 128))
        self.n_layers = int(config.get("n_layers", 1))
        dp = config["dropout_probs"] or [0.25, 0.5]
        self.emb_dropout, self.ct_dropout = float(dp[0]), float(dp[1])
        self.loss_type = str(config["loss_type"] or "CE")

    def init_params(self, rng):
        ks = split_keys(rng, 5 + self.n_layers)
        grus = []
        d_in = self.embedding_size
        for i in range(self.n_layers):
            grus.append(gru_params(ks[5 + i], d_in, self.hidden_size))
            d_in = self.hidden_size
        return {
            "item_emb": xavier_normal(ks[0], (self.n_items, self.embedding_size)),
            "gru": grus,
            "a1": linear_params(ks[1], self.hidden_size, self.hidden_size,
                                bias=False),
            "a2": linear_params(ks[2], self.hidden_size, self.hidden_size,
                                bias=False),
            "vt": linear_params(ks[3], self.hidden_size, 1, bias=False),
            "b": linear_params(ks[4], 2 * self.hidden_size,
                               self.embedding_size, bias=False),
        }

    def seq_output(self, params, batch, rng, train):
        seq = batch["item_seq"]
        mask = seq > 0
        h = params["item_emb"][seq]
        if train and self.emb_dropout > 0:
            rng, k = jax.random.split(rng)
            keep = jax.random.bernoulli(k, 1.0 - self.emb_dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - self.emb_dropout), 0.0)
        for gp in params["gru"]:
            h0 = jnp.zeros((h.shape[0], self.hidden_size))
            h, _ = gru_scan(gp, h, h0, mask=mask)
        idx = jnp.maximum(batch["item_seq_len"] - 1, 0)
        ht = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        c_global = ht
        q1 = linear(params["a1"], h)
        q2 = linear(params["a2"], ht)[:, None, :] * mask[:, :, None]
        alpha = linear(params["vt"], jax.nn.sigmoid(q1 + q2))[:, :, 0]
        c_local = jnp.sum(alpha[:, :, None] * h, axis=1)
        c_t = jnp.concatenate([c_local, c_global], axis=-1)
        if train and self.ct_dropout > 0:
            rng, k = jax.random.split(rng)
            keep = jax.random.bernoulli(k, 1.0 - self.ct_dropout, c_t.shape)
            c_t = jnp.where(keep, c_t / (1.0 - self.ct_dropout), 0.0)
        return linear(params["b"], c_t)

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
