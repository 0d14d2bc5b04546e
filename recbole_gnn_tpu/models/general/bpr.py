"""BPR — matrix factorization with the BPR pairwise loss.

RecBole-fallback baseline ([recbole] recbole/model/general_recommender/
bpr.py): user/item ID embeddings, xavier-normal init, BPR loss only.
The reference's tests exercise it through the GNN factory fallback
(tests/test_model.py:15-19).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import BaseRecommender
from recbole_gnn_tpu.models.init import xavier_normal
from recbole_gnn_tpu.models.losses import bpr_loss
from recbole_gnn_tpu.utils.enums import ModelType, InputType


class BPR(BaseRecommender):

    model_type = ModelType.GENERAL
    input_type = InputType.PAIRWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": xavier_normal(ku, (self.n_users, self.embedding_size)),
            "item_emb": xavier_normal(ki, (self.n_items, self.embedding_size)),
        }

    def propagate(self, params, consts, extras):
        return params["user_emb"], params["item_emb"]

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        u = params["user_emb"][user]
        loss = bpr_loss(jnp.sum(u * params["item_emb"][pos], -1),
                        jnp.sum(u * params["item_emb"][neg], -1), w)
        return loss, {"mf": loss}
