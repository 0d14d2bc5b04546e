"""SSL4REC — DNN two-tower with item-dropout contrastive learning.

Parity target: reference ssl4rec.py — user/item towers emb→1024(ReLU)
→128(tanh) over ID embeddings (:102-154); in-batch sampled-softmax rec
loss (:50-57) + item-dropout CL (:146-163) + EmbLoss reg; full-sort
computes towers over all ids (:88-98).  No graph propagation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import BaseRecommender
from recbole_gnn_tpu.models.init import linear, linear_params, split_keys, \
    xavier_uniform
from recbole_gnn_tpu.models.losses import (
    batch_softmax_loss, cl_nce_masked, emb_loss)
from recbole_gnn_tpu.utils.enums import ModelType, InputType


class SSL4REC(BaseRecommender):

    model_type = ModelType.GENERAL
    input_type = InputType.PAIRWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.emb_size = int(config.get("embedding_size", 64))
        self.tau = float(config.get("tau", 0.1))
        self.reg_weight = float(config.get("reg_weight", 1e-4))
        self.cl_rate = float(config.get("ssl_weight", 1e-5))
        self.drop_ratio = float(config.get("drop_ratio", 0.1))
        self.require_pow = bool(config["require_pow"])

    def init_params(self, rng):
        ks = split_keys(rng, 6)
        return {
            "user_emb": xavier_uniform(ks[0], (self.n_users, self.emb_size)),
            "item_emb": xavier_uniform(ks[1], (self.n_items, self.emb_size)),
            "user_tower": [linear_params(ks[2], self.emb_size, 1024),
                           linear_params(ks[3], 1024, 128)],
            "item_tower": [linear_params(ks[4], self.emb_size, 1024),
                           linear_params(ks[5], 1024, 128)],
        }

    @staticmethod
    def _tower(tp, x):
        x = jax.nn.relu(linear(tp[0], x))
        return jnp.tanh(linear(tp[1], x))

    def propagate(self, params, consts, extras):
        """Towers over the full catalogs (reference full-sort :88-98)."""
        u = self._tower(params["user_tower"], params["user_emb"])
        i = self._tower(params["item_tower"], params["item_emb"])
        return u, i

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos = batch["user_id"], batch["item_id"]
        w = batch.get("weight")
        u_e = self._tower(params["user_tower"], params["user_emb"][user])
        i_e = self._tower(params["item_tower"], params["item_emb"][pos])
        rec = batch_softmax_loss(u_e, i_e, self.tau, w)

        # item-dropout CL: two dropped views of the positive items'
        # base embeddings through the item tower (reference :146-163)
        base = params["item_emb"][pos]
        k1, k2 = jax.random.split(rng)
        keep1 = jax.random.bernoulli(k1, 1.0 - self.drop_ratio, base.shape)
        keep2 = jax.random.bernoulli(k2, 1.0 - self.drop_ratio, base.shape)
        v1 = self._tower(params["item_tower"],
                         jnp.where(keep1, base / (1.0 - self.drop_ratio), 0.0))
        v2 = self._tower(params["item_tower"],
                         jnp.where(keep2, base / (1.0 - self.drop_ratio), 0.0))
        mask = (w > 0) if w is not None else jnp.ones(pos.shape[0], bool)
        cl = cl_nce_masked(v1, v2, self.tau, mask, "mean")

        reg = emb_loss([u_e, i_e], user.shape[0],
                       require_pow=self.require_pow, weight=w)
        loss = rec + self.cl_rate * cl + self.reg_weight * reg
        return loss, {"rec": rec, "cl": cl, "reg": reg}
