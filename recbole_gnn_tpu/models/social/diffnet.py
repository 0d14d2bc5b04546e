"""DiffNet — recursive social influence diffusion.

Parity target: reference social_recommender/diffnet.py — user tower:
n_layers× row-normalized social propagation with layer SUM, plus
one-hop item→user interest aggregation over the row-normalized U-I
graph (:83-106); optional frozen pretrained review embeddings with
distribution rescale (:64-81); BPR + EmbLoss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from recbole_gnn_tpu.models.base import SocialRecommender
from recbole_gnn_tpu.models.init import xavier_uniform
from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.spmm import matvec_any


class DiffNet(SocialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.n_layers = int(config.get("n_layers", 2))
        self.reg_weight = float(config.get("reg_weight", 1e-5))
        self.pretrained_review = bool(config["pretrained_review"])
        if self.pretrained_review:
            # frozen review embeddings with distribution rescale
            # (reference diffnet.py:64-81); loaded via .user/.item
            # float_seq columns user_review_emb / item_review_emb
            u_rev = dataset.feat_matrix("user_feat", "user_review_emb")
            i_rev = dataset.feat_matrix("item_feat", "item_review_emb")
            if u_rev.shape[1] != self.embedding_size:
                raise ValueError(
                    "review embedding width must equal embedding_size")
            self.consts["user_review"] = jnp.asarray(
                self._convert_distribution(u_rev))
            self.consts["item_review"] = jnp.asarray(
                self._convert_distribution(i_rev))

        import scipy.sparse as sp
        from recbole_gnn_tpu.models.social.common import to_device_matrix

        users, items = dataset.user_item_arrays()
        # U←I interest aggregation: A[u, i] = 1/deg(u) (reference
        # get_bipartite_inter_mat(row='user'), dataset.py:81-99);
        # sparse end-to-end — densifies only under the size budget
        deg_u = np.bincount(users, minlength=self.n_users).astype(np.float64)
        a = sp.coo_matrix(
            ((1.0 / np.maximum(deg_u[users], 1.0)).astype(np.float32),
             (users, items)), shape=(self.n_users, self.n_items))
        self.consts["ui"] = to_device_matrix(a, config)

        # social diffusion: new_u[s] = Σ_{(s,t)∈net} 1/deg(s) · u[t]
        # (reference forward :102 — conv over flipped row-normalized net)
        src, dst = dataset.net_edges()
        deg_s = np.bincount(src, minlength=self.n_users).astype(np.float64)
        s = sp.coo_matrix(
            ((1.0 / np.maximum(deg_s[src], 1.0)).astype(np.float32),
             (src, dst)), shape=(self.n_users, self.n_users))
        self.consts["net"] = to_device_matrix(s, config)

    @staticmethod
    def _convert_distribution(x):
        """Rescale to mean 0, 0.2·std (reference convertDistribution
        :83-86)."""
        std = x.std()
        return (x - x.mean()) * 0.2 / (std if std > 0 else 1.0)

    def init_params(self, rng):
        ku, ki, kfu, kfi = jax.random.split(rng, 4)
        params = {
            "user_emb": xavier_uniform(ku, (self.n_users, self.embedding_size)),
            "item_emb": xavier_uniform(ki, (self.n_items, self.embedding_size)),
        }
        if self.pretrained_review:
            from recbole_gnn_tpu.models.init import linear_params
            params["user_fusion"] = linear_params(
                kfu, self.embedding_size, self.embedding_size)
            params["item_fusion"] = linear_params(
                kfi, self.embedding_size, self.embedding_size)
        return params

    def propagate(self, params, consts, extras):
        u = params["user_emb"]
        items = params["item_emb"]
        if self.pretrained_review:
            from recbole_gnn_tpu.models.init import linear

            def rescale(x):
                std = jnp.std(x)
                return (x - jnp.mean(x)) * 0.2 / jnp.maximum(std, 1e-12)

            u = u + rescale(jax.nn.sigmoid(
                linear(params["user_fusion"], consts["user_review"])))
            items = items + rescale(jax.nn.sigmoid(
                linear(params["item_fusion"], consts["item_review"])))
        from_items = matvec_any(consts["ui"], items)
        layers = [u]
        for _ in range(self.n_layers):
            u = matvec_any(consts["net"], u)
            layers.append(u)
        final_u = sum(layers) + from_items
        return final_u, items

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        u_all, i_all = self.propagate(params, consts, extras)
        u_e, p_e, n_e = u_all[user], i_all[pos], i_all[neg]
        mf = bpr_loss(jnp.sum(u_e * p_e, -1), jnp.sum(u_e * n_e, -1), w)
        reg = emb_loss([params["user_emb"][user], params["item_emb"][pos],
                        params["item_emb"][neg]], user.shape[0], weight=w)
        return mf + self.reg_weight * reg, {"mf": mf, "reg": reg}
