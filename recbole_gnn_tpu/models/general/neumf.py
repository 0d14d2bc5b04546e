"""NeuMF — neural matrix factorization (GMF ⊕ MLP, BCE loss).

RecBole-fallback baseline ([recbole] recbole/model/general_recommender/
neumf.py): separate GMF/MLP embeddings, MLP tower over concatenated
pairs, sigmoid prediction head, pointwise BCE.  Trains here on the
pairwise loader by scoring pos (label 1) and sampled neg (label 0) —
equivalent to RecBole's pointwise loader with one uniform negative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import BaseRecommender
from recbole_gnn_tpu.models.init import (
    linear, linear_params, normal_init, split_keys)
from recbole_gnn_tpu.utils.enums import ModelType, InputType


class NeuMF(BaseRecommender):

    model_type = ModelType.GENERAL
    input_type = InputType.POINTWISE
    factorized_eval = False

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mf_size = int(config.get("mf_embedding_size", 64))
        self.mlp_size = int(config.get("mlp_embedding_size", 64))
        self.mlp_hidden = list(config["mlp_hidden_size"] or [128, 64])
        self.dropout_prob = float(config.get("dropout_prob", 0.1))
        self.mf_train = config["mf_train"] is not False
        self.mlp_train = config["mlp_train"] is not False

    def init_params(self, rng):
        ks = split_keys(rng, 5 + len(self.mlp_hidden))
        params = {
            "user_mf": normal_init(ks[0], (self.n_users, self.mf_size), 0.01),
            "item_mf": normal_init(ks[1], (self.n_items, self.mf_size), 0.01),
            "user_mlp": normal_init(ks[2], (self.n_users, self.mlp_size), 0.01),
            "item_mlp": normal_init(ks[3], (self.n_items, self.mlp_size), 0.01),
            "mlp": [],
        }
        dims = [2 * self.mlp_size] + self.mlp_hidden
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            params["mlp"].append(linear_params(ks[4 + i], a, b))
        pred_in = (self.mf_size if self.mf_train else 0) + \
            (self.mlp_hidden[-1] if self.mlp_train else 0)
        params["predict"] = linear_params(ks[-1], pred_in, 1)
        return params

    def _scores(self, params, users, items, rng=None, train=False):
        parts = []
        if self.mf_train:
            parts.append(params["user_mf"][users] * params["item_mf"][items])
        if self.mlp_train:
            h = jnp.concatenate([params["user_mlp"][users],
                                 params["item_mlp"][items]], axis=-1)
            for lp in params["mlp"]:
                if train and rng is not None and self.dropout_prob > 0:
                    rng, k = jax.random.split(rng)
                    keep = jax.random.bernoulli(k, 1.0 - self.dropout_prob,
                                                h.shape)
                    h = jnp.where(keep, h / (1.0 - self.dropout_prob), 0.0)
                h = jax.nn.relu(linear(lp, h))
            parts.append(h)
        logit = linear(params["predict"], jnp.concatenate(parts, axis=-1))[..., 0]
        return logit

    def propagate(self, params, consts, extras):
        # NeuMF has no factorized scorer; evaluator falls back to the
        # pairwise scoring hook below.
        raise NotImplementedError

    def score_users_vs_all(self, params, users):
        """(B, n_items) logits — full cross-scoring for full-sort eval."""
        B = users.shape[0]
        items = jnp.arange(self.n_items)
        u_rep = jnp.repeat(users[:, None], self.n_items, axis=1).reshape(-1)
        i_rep = jnp.tile(items[None, :], (B, 1)).reshape(-1)
        return self._scores(params, u_rep, i_rep).reshape(B, self.n_items)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        k1, k2 = jax.random.split(rng)
        pos_logit = self._scores(params, user, pos, k1, True)
        neg_logit = self._scores(params, user, neg, k2, True)
        # BCE with labels 1/0 (stable log-sigmoid form), mean over the
        # 2B pos+neg rows — matches RecBole's pointwise loader with one
        # uniform negative per positive
        losses = (-jax.nn.log_sigmoid(pos_logit)
                  - jax.nn.log_sigmoid(-neg_logit)) / 2.0
        loss = (jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
                if w is not None else jnp.mean(losses))
        return loss, {"bce": loss}
