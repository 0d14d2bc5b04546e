"""SASRec — causal self-attention sequence model (fallback baseline).

Semantics: [recbole] recbole/model/sequential_recommender/sasrec.py —
item + positional embeddings → LayerNorm + dropout → causal
TransformerEncoder → state at last position scores the catalog.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import normal_init, split_keys
from recbole_gnn_tpu.models.layers import (
    causal_additive_mask, layer_norm, transformer_encoder,
    transformer_params)
from recbole_gnn_tpu.models.losses import bpr_loss, cross_entropy


class SASRec(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_layers = int(config.get("n_layers", 2))
        self.n_heads = int(config.get("n_heads", 2))
        self.hidden_size = int(config.get("hidden_size", 64))
        self.inner_size = int(config.get("inner_size", 256))
        self.hidden_dropout_prob = float(config.get("hidden_dropout_prob", 0.5))
        self.attn_dropout_prob = float(config.get("attn_dropout_prob", 0.5))
        self.initializer_range = float(config.get("initializer_range", 0.02))
        self.loss_type = str(config["loss_type"] or "CE")

    def init_params(self, rng):
        k1, k2, k3 = split_keys(rng, 3)
        return {
            "item_emb": normal_init(k1, (self.n_items, self.hidden_size),
                                    self.initializer_range),
            "pos_emb": normal_init(k2, (self.max_seq_len, self.hidden_size),
                                   self.initializer_range),
            "transformer": transformer_params(
                k3, self.n_layers, self.n_heads, self.hidden_size,
                self.inner_size),
            "ln_in": {"g": jnp.ones((self.hidden_size,)),
                      "b": jnp.zeros((self.hidden_size,))},
        }

    def seq_output(self, params, batch, rng, train):
        seq = batch["item_seq"]
        mask = seq > 0
        L = seq.shape[1]
        h = params["item_emb"][seq] + params["pos_emb"][None, :L, :]
        h = layer_norm(params["ln_in"], h)
        if train and self.hidden_dropout_prob > 0:
            rng, k = jax.random.split(rng)
            keep = jax.random.bernoulli(k, 1.0 - self.hidden_dropout_prob,
                                        h.shape)
            h = jnp.where(keep, h / (1.0 - self.hidden_dropout_prob), 0.0)
        attn_mask = causal_additive_mask(mask)
        out = transformer_encoder(
            params["transformer"], h, attn_mask,
            dropout_rng=rng if train else None,
            dropout=self.hidden_dropout_prob if train else 0.0,
            n_heads=self.n_heads,
            attn_dropout=self.attn_dropout_prob if train else 0.0)
        idx = jnp.maximum(batch["item_seq_len"] - 1, 0)
        return jnp.take_along_axis(out, idx[:, None, None], axis=1)[:, 0]

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
