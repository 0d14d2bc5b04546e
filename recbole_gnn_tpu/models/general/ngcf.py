"""NGCF — bi-interaction GNN towers over the normalized U-I graph.

Parity target: reference recbole_gnn/model/general_recommender/ngcf.py
(BiGNNConv stack with LeakyReLU → message dropout → L2-normalize per
layer, concat of all layer outputs :73-104; edge dropout via
dropout_adj when node_dropout>0 :75-93; BPR + EmbLoss on *propagated*
embeddings :124).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import GeneralGraphRecommender
from recbole_gnn_tpu.models.init import linear, xavier_normal, split_keys
from recbole_gnn_tpu.models.layers import bignn_params
from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.spmm import (
    BipartiteDenseGraph, spmm_any, spmm_dense_bipartite_dropout)
from recbole_gnn_tpu.ops.graphops import edge_dropout_mask


class NGCF(GeneralGraphRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.hidden_size_list = [self.embedding_size] + list(
            config["hidden_size_list"] or [64, 64, 64])
        self.node_dropout = float(config.get("node_dropout", 0.0))
        self.message_dropout = float(config.get("message_dropout", 0.0))
        self.reg_weight = float(config.get("reg_weight", 1e-5))

    def init_params(self, rng):
        keys = split_keys(rng, 2 + len(self.hidden_size_list) - 1)
        params = {
            "user_emb": xavier_normal(keys[0], (self.n_users, self.embedding_size)),
            "item_emb": xavier_normal(keys[1], (self.n_items, self.embedding_size)),
            "layers": [
                bignn_params(k, d_in, d_out)
                for k, d_in, d_out in zip(
                    keys[2:], self.hidden_size_list[:-1],
                    self.hidden_size_list[1:])
            ],
        }
        return params

    def _forward(self, params, consts, rng, train: bool):
        graph = consts["graph"]
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        outs = [x]
        # edge set dropped ONCE per forward, shared by every layer
        # (reference dropout_adj runs before the layer loop, :74-90);
        # the dense path samples per direction inside the helper, so a
        # fixed key keeps the masks constant across layers there too
        drop_key = None
        dropped_graph = graph
        if train and self.node_dropout > 0:
            rng, drop_key = jax.random.split(rng)
            if not isinstance(graph, BipartiteDenseGraph):
                keep = edge_dropout_mask(drop_key, graph.n_edges_padded,
                                         self.node_dropout)
                dropped_graph = graph.with_weight(
                    graph.weight * keep.astype(jnp.float32))
        for lp in params["layers"]:
            if drop_key is not None and isinstance(graph,
                                                   BipartiteDenseGraph):
                x_prop = spmm_dense_bipartite_dropout(
                    graph, x, drop_key, self.node_dropout)
            else:
                x_prop = spmm_any(dropped_graph, x)
            x = linear(lp["lin1"], x_prop + x) + linear(lp["lin2"], x_prop * x)
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
            if train and self.message_dropout > 0:
                rng, k = jax.random.split(rng)
                keep = jax.random.bernoulli(k, 1.0 - self.message_dropout,
                                            x.shape)
                x = jnp.where(keep, x / (1.0 - self.message_dropout), 0.0)
            from recbole_gnn_tpu.models.init import l2_normalize
            x = l2_normalize(x)
            outs.append(x)
        all_emb = jnp.concatenate(outs, axis=1)
        return all_emb[:self.n_users], all_emb[self.n_users:]

    def propagate(self, params, consts, extras):
        return self._forward(params, consts, jax.random.PRNGKey(0), False)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        user_all, item_all = self._forward(params, consts, rng, True)
        u_e, p_e, n_e = user_all[user], item_all[pos], item_all[neg]
        mf = bpr_loss(jnp.sum(u_e * p_e, -1), jnp.sum(u_e * n_e, -1), w)
        # reg on the PROPAGATED embeddings (reference ngcf.py:124)
        reg = emb_loss([u_e, p_e, n_e], user.shape[0], weight=w)
        return mf + self.reg_weight * reg, {"mf": mf, "reg": reg}
