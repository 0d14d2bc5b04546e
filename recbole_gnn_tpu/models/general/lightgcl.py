"""LightGCL — SVD-guided graph contrastive learning.

Parity target: reference lightgcl.py — own sym-normalized rectangular
adjacency (:86-117); K× SpMM with value-dropout (F.dropout on values,
scaled) (:119-142); layer SUM aggregation (:139-140); rank-q
svd_lowrank precomputed at init (:58-63); BPR (mean) + L2-over-all-
params reg (:157-182) + clamped InfoNCE between SVD-propagated G and E
views (:184-213).

TPU-native: svd_lowrank → ops.randomized_svd over the sparse operator;
the rectangular adjacency uses the dense MXU path at benchmark scales
(value-dropout = dense Bernoulli on entries, exact per-nnz semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from recbole_gnn_tpu.models.base import BaseRecommender
from recbole_gnn_tpu.models.init import xavier_uniform
from recbole_gnn_tpu.models.losses import reg_loss_l2
from recbole_gnn_tpu.ops.spmm import build_graph, spmm
from recbole_gnn_tpu.ops.svd import randomized_svd_sparse
from recbole_gnn_tpu.utils.enums import ModelType, InputType


class LightGCL(BaseRecommender):

    model_type = ModelType.GENERAL
    input_type = InputType.PAIRWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embed_dim = int(config.get("embedding_size", 64))
        self.n_layers = int(config.get("n_layers", 2))
        self.dropout = float(config.get("dropout", 0.0))
        self.temp = float(config.get("temp", 0.8))
        self.lambda_1 = float(config.get("lambda1", 0.01))
        self.lambda_2 = float(config.get("lambda2", 1e-5))
        self.q = int(config.get("q", 5))

        users, items = dataset.user_item_arrays()
        row_deg = np.bincount(users, minlength=self.n_users).astype(np.float64)
        col_deg = np.bincount(items, minlength=self.n_items).astype(np.float64)
        w = 1.0 / np.sqrt(np.maximum(row_deg[users] * col_deg[items], 1e-12))
        max_entries = int(config.get("dense_graph_max_entries", 3e8))
        self._dense = (config["enable_sparse"] is not True
                       and self.n_users * self.n_items <= max_entries)
        if self._dense:
            a = np.zeros((self.n_users, self.n_items), dtype=np.float32)
            np.add.at(a, (users, items), w.astype(np.float32))
            self.consts["adj"] = jnp.asarray(a)
        else:
            # web-scale catalogs: rectangular COO both directions,
            # streaming-Pallas metadata attached (config-gated)
            wp = config["use_pallas_spmm"] is not False
            self.consts["adj_ui"] = build_graph(
                items, users, w, self.n_users, n_src_nodes=self.n_items,
                with_pallas=wp)
            self.consts["adj_iu"] = build_graph(
                users, items, w, self.n_items, n_src_nodes=self.n_users,
                with_pallas=wp)

        # rank-q randomized SVD of the normalized adjacency (init-time)
        svd_u, s, svd_v = randomized_svd_sparse(
            jax.random.PRNGKey(int(config.get("seed", 2020))),
            jnp.asarray(users), jnp.asarray(items), jnp.asarray(w, jnp.float32),
            self.n_users, self.n_items, self.q)
        self.consts["u_mul_s"] = svd_u * s[None, :]
        self.consts["v_mul_s"] = svd_v * s[None, :]
        self.consts["ut"] = svd_u.T
        self.consts["vt"] = svd_v.T

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": xavier_uniform(ku, (self.n_users, self.embed_dim)),
            "item_emb": xavier_uniform(ki, (self.n_items, self.embed_dim)),
        }

    def _forward_lists(self, params, consts, rng, train: bool):
        e_u, e_i = params["user_emb"], params["item_emb"]
        e_u_list, e_i_list = [e_u], [e_i]
        for _ in range(self.n_layers):
            if self._dense:
                a_l = consts["adj"]
                if train and self.dropout > 0:
                    rng, k = jax.random.split(rng)
                    keep = jax.random.bernoulli(
                        k, 1.0 - self.dropout, a_l.shape)
                    a_l = jnp.where(keep, a_l / (1.0 - self.dropout), 0.0)
                z_u = jnp.dot(a_l, e_i_list[-1],
                              preferred_element_type=jnp.float32)
                z_i = jnp.dot(a_l.T, e_u_list[-1],
                              preferred_element_type=jnp.float32)
            else:
                g_ui, g_iu = consts["adj_ui"], consts["adj_iu"]
                if train and self.dropout > 0:
                    # F.dropout-on-values semantics: per-nnz keep + scale,
                    # independent per direction (the reference calls
                    # sparse_dropout separately for each spmm, :131-136)
                    rng, k1 = jax.random.split(rng)
                    rng, k2 = jax.random.split(rng)
                    keep1 = jax.random.bernoulli(
                        k1, 1.0 - self.dropout, g_ui.weight.shape)
                    keep2 = jax.random.bernoulli(
                        k2, 1.0 - self.dropout, g_iu.weight.shape)
                    g_ui = g_ui.with_weight(
                        g_ui.weight * keep1 / (1.0 - self.dropout))
                    g_iu = g_iu.with_weight(
                        g_iu.weight * keep2 / (1.0 - self.dropout))
                z_u = spmm(g_ui, e_i_list[-1])
                z_i = spmm(g_iu, e_u_list[-1])
            e_u_list.append(z_u)
            e_i_list.append(z_i)
        return e_u_list, e_i_list

    def propagate(self, params, consts, extras):
        e_u_list, e_i_list = self._forward_lists(
            params, consts, jax.random.PRNGKey(0), False)
        return sum(e_u_list), sum(e_i_list)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        e_u_list, e_i_list = self._forward_lists(params, consts, rng, True)
        e_u, e_i = sum(e_u_list), sum(e_i_list)

        u_e, p_e, n_e = e_u[user], e_i[pos], e_i[neg]
        diff = jnp.sum(u_e * p_e, -1) - jnp.sum(u_e * n_e, -1)
        l_bpr = -jax.nn.log_sigmoid(diff)
        if w is not None:
            l_bpr = jnp.sum(l_bpr * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            l_bpr = jnp.mean(l_bpr)
        reg = self.lambda_2 * reg_loss_l2(
            [params["user_emb"], params["item_emb"]])

        # SVD-propagated views (reference calc_ssl_loss :196-206)
        g_u_list, g_i_list = [params["user_emb"]], [params["item_emb"]]
        for layer in range(self.n_layers):
            vt_ei = jnp.dot(consts["vt"], e_i_list[layer],
                            preferred_element_type=jnp.float32)
            g_u_list.append(jnp.dot(consts["u_mul_s"], vt_ei,
                                    preferred_element_type=jnp.float32))
            ut_eu = jnp.dot(consts["ut"], e_u_list[layer],
                            preferred_element_type=jnp.float32)
            g_i_list.append(jnp.dot(consts["v_mul_s"], ut_eu,
                                    preferred_element_type=jnp.float32))
        g_u, g_i = sum(g_u_list), sum(g_i_list)

        def _mean(x):
            if w is not None:
                return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)
            return jnp.mean(x)

        # log Σ exp(·) computed as logsumexp for overflow safety (the
        # reference's raw exp form, lightgcl.py:208, can inf out)
        neg_score = _mean(jax.nn.logsumexp(
            jnp.dot(g_u[user], e_u.T,
                    preferred_element_type=jnp.float32) / self.temp, axis=1))
        neg_score = neg_score + _mean(jax.nn.logsumexp(
            jnp.dot(g_i[pos], e_i.T,
                    preferred_element_type=jnp.float32) / self.temp, axis=1))
        pos_score = _mean(jnp.clip(
            jnp.sum(g_u[user] * e_u[user], -1) / self.temp, -5.0, 5.0))
        pos_score = pos_score + _mean(jnp.clip(
            jnp.sum(g_i[pos] * e_i[pos], -1) / self.temp, -5.0, 5.0))
        ssl = self.lambda_1 * (neg_score - pos_score)

        loss = l_bpr + reg + ssl
        return loss, {"bpr": l_bpr, "reg": reg, "ssl": ssl}
