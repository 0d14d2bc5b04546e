"""LightGCN — linear propagation over the normalized U-I graph.

Parity target: reference recbole_gnn/model/general_recommender/
lightgcn.py (K× LightGCNConv, mean of layer-0..K embeddings
:70-81; BPR + EmbLoss(require_pow) :83-110).  TPU-native: the whole
forward is K SpMMs over the static dst-sorted adjacency — one fused
gather/segment-sum per layer, bf16-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import GeneralGraphRecommender
from recbole_gnn_tpu.models.init import xavier_uniform
from recbole_gnn_tpu.models.layers import lightgcn_propagate
from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss


class LightGCN(GeneralGraphRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.latent_dim = int(config.get("embedding_size", 64))
        self.n_layers = int(config.get("n_layers", 2))
        self.reg_weight = float(config.get("reg_weight", 1e-5))
        self.require_pow = bool(config["require_pow"])

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": xavier_uniform(ku, (self.n_users, self.latent_dim)),
            "item_emb": xavier_uniform(ki, (self.n_items, self.latent_dim)),
        }

    def propagate(self, params, consts, extras):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        layers = lightgcn_propagate(consts["graph"], ego, self.n_layers)
        final = jnp.mean(jnp.stack(layers, axis=0), axis=0)
        return final[:self.n_users], final[self.n_users:]

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user = batch["user_id"]
        pos = batch["item_id"]
        neg = batch["neg_item_id"]
        w = batch.get("weight")

        user_all, item_all = self.propagate(params, consts, extras)
        u_e, p_e, n_e = user_all[user], item_all[pos], item_all[neg]
        pos_scores = jnp.sum(u_e * p_e, axis=-1)
        neg_scores = jnp.sum(u_e * n_e, axis=-1)
        mf = bpr_loss(pos_scores, neg_scores, w)

        reg = emb_loss(
            [params["user_emb"][user], params["item_emb"][pos],
             params["item_emb"][neg]],
            batch_size=user.shape[0], require_pow=self.require_pow, weight=w)
        loss = mf + self.reg_weight * reg
        return loss, {"mf": mf, "reg": reg}
