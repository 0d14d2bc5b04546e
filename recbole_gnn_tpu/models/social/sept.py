"""SEPT — socially-aware self-supervised tri-training.

Parity target: reference social_recommender/sept.py — main LightGCN
forward over the joint U-I graph with per-layer L2-norm and layer sum
(:145-163); friend view (S·S)⊙S+I and sharing view (R·Rᵀ)⊙S+I
precomputed host-side (:91-109); per-epoch edge-dropout subgraph over
the joint inter+social graph (:111-133, invoked by SEPTTrainer after
warm_up_epochs — loss_mode here); pseudo-label top-instance_cnt
neighbor-discrimination InfoNCE (:189-209, :240-279).

TPU-first: the subgraph keeps static nnz — the fixed joint edge list
(inter both directions + net one direction) is re-weighted per epoch
from a keep-mask (sym_norm re-normalization), stored in extras.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from recbole_gnn_tpu.models.base import SocialRecommender
from recbole_gnn_tpu.models.init import xavier_uniform
from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.graphops import sym_norm_weights
from recbole_gnn_tpu.ops.spmm import build_graph, matvec_any, spmm, spmm_any


def _l2norm(x):
    from recbole_gnn_tpu.models.init import l2_normalize
    return l2_normalize(x)


class SEPT(SocialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.latent_dim = int(config.get("embedding_size", 64))
        self.n_layers = int(config.get("n_layers", 2))
        self.drop_ratio = float(config.get("drop_ratio", 0.3))
        self.instance_cnt = int(config.get("instance_cnt", 10))
        self.reg_weight = float(config.get("reg_weight", 1e-5))
        self.ssl_weight = float(config.get("ssl_weight", 1e-7))
        self.ssl_tau = float(config.get("ssl_tau", 0.1))
        self.warm_up_epochs = int(config.get("warm_up_epochs", 100))

        # preference view: joint sym-normalized U-I adjacency
        self.consts["graph"] = dataset.get_norm_adj_graph()

        # friend / sharing user views (reference :91-109), host scipy
        s_src, s_dst, s_val = dataset.net_coo()
        u_arr, i_arr, y_val = dataset.inter_coo()
        n = self.n_users
        from recbole_gnn_tpu.models.social.common import (
            sym_normalize_support, to_device_matrix)
        S = sp.coo_matrix((s_val, (s_src, s_dst)), shape=(n, n)).tocsr()
        R = sp.coo_matrix((y_val, (u_arr, i_arr)),
                          shape=(n, self.n_items)).tocsr()
        # sparse end-to-end (reference keeps scipy sparse; densifying
        # n_users² here would cost 40+ GB at 100k users)
        friend = (S.dot(S)).multiply(S) + sp.eye(n, format="csr")
        sharing = (R.dot(R.T)).multiply(S) + sp.eye(n, format="csr")
        self.consts["friend"] = to_device_matrix(
            sym_normalize_support(friend), config)
        self.consts["sharing"] = to_device_matrix(
            sym_normalize_support(sharing), config)

        # static joint edge list for the per-epoch perturbed subgraph:
        # inter both directions + net ONE direction (reference :111-133)
        users, items = dataset.user_item_arrays()
        net_src, net_dst = dataset.net_edges()
        src = np.concatenate([users, items + n, net_src])
        dst = np.concatenate([items + n, users, net_dst])
        # consumed re-weighted per EPOCH: the ELL layouts engage via
        # the extras-carried regathered slot weights (epoch_start)
        sub = build_graph(src, dst, np.ones(len(src), np.float32),
                          n + self.n_items)
        self.consts["sub_graph"] = sub
        self._n_inter = len(users)
        self._n_net = len(net_src)
        # edge kind/id in dst-sorted order: interactions keep-mask
        # drives both directions; net edges have their own mask
        order = np.argsort(dst, kind="stable")
        kind = np.concatenate([
            np.arange(self._n_inter), np.arange(self._n_inter),
            self._n_inter + np.arange(self._n_net)])
        self.consts["sub_edge_id"] = jnp.asarray(
            kind[order].astype(np.int32))
        self._sub_builder = None

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": xavier_uniform(ku, (self.n_users, self.latent_dim)),
            "item_emb": xavier_uniform(ki, (self.n_items, self.latent_dim)),
        }

    # -- per-epoch subgraph ------------------------------------------------

    def init_extras(self, rng):
        return self._make_extras(rng, self.consts)

    def _make_extras(self, rng, consts):
        w = self._build_sub_weight(rng, consts)
        out = {"sub_weight": w}
        g = consts["sub_graph"]
        if g.ell is not None:
            # epoch-granularity ELL reweight (never per step — the
            # (E_pad,) gathers carry the usual per-row cost)
            from recbole_gnn_tpu.ops.ell_spmm import reweight_ws
            out["sub_ell"] = reweight_ws(g.ell, w[:g.n_edges])
            out["sub_ell_r"] = reweight_ws(g.rev_ell, w[:g.n_edges])
        return out

    def _build_sub_weight(self, rng, consts):
        # consts passed explicitly: closure-captured edge arrays would
        # bake into the HLO as constants and stall compilation
        k1, k2 = jax.random.split(rng)
        keep_inter = jax.random.uniform(k1, (self._n_inter,)) >= self.drop_ratio
        keep_net = jax.random.uniform(k2, (self._n_net,)) >= self.drop_ratio
        keep = jnp.concatenate([keep_inter, keep_net])
        mask_e = keep[consts["sub_edge_id"]]
        g = consts["sub_graph"]
        return sym_norm_weights(g.src, g.dst, g.n_nodes, mask=mask_e)

    def epoch_start(self, epoch, params, consts, extras, rng):
        if epoch < self.warm_up_epochs:
            return extras
        if self._sub_builder is None:
            self._sub_builder = jax.jit(self._make_extras)
        return self._sub_builder(rng, consts)

    def loss_mode(self, epoch):
        # mode 0 = warm-up: rec loss only (reference SEPTTrainer :174-179)
        return 0 if epoch < self.warm_up_epochs else 1

    # -- forwards ----------------------------------------------------------

    def _joint_forward(self, params, graph_apply):
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        outs = [x]
        for _ in range(self.n_layers):
            x = graph_apply(x)
            outs.append(_l2norm(x))
        final = sum(outs)
        return final[:self.n_users], final[self.n_users:]

    def propagate(self, params, consts, extras):
        return self._joint_forward(
            params, lambda x: spmm_any(consts["graph"], x))

    def _user_view_forward(self, params, consts):
        def run(mat):
            u = params["user_emb"]
            outs = [u]
            for _ in range(self.n_layers):
                u = matvec_any(mat, u)
                outs.append(_l2norm(u))
            return sum(outs)

        return run(consts["friend"]), run(consts["sharing"])

    # -- losses ------------------------------------------------------------

    def _ssl_loss(self, aug_u, positive_idx, emb, wmask):
        pos_emb = aug_u[positive_idx]                       # (B, k, D)
        pos_score = jnp.sum(emb[:, None, :] * pos_emb, axis=2)
        ttl = jnp.dot(emb, aug_u.T, preferred_element_type=jnp.float32)
        ttl = jnp.where(wmask[None, :] > 0, ttl, -1e30)
        pos_sum = jnp.sum(jnp.exp(pos_score / self.ssl_tau), axis=1)
        ttl_sum = jnp.sum(jnp.exp(jnp.clip(ttl / self.ssl_tau, -60, 60)),
                          axis=1)
        loss = -jnp.log(jnp.maximum(pos_sum, 1e-24) /
                        jnp.maximum(ttl_sum, 1e-24))
        return jnp.sum(loss * wmask)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        u_all, i_all = self.propagate(params, consts, extras)
        u_e, p_e, n_e = u_all[user], i_all[pos], i_all[neg]
        mf = bpr_loss(jnp.sum(u_e * p_e, -1), jnp.sum(u_e * n_e, -1), w)
        reg = emb_loss([params["user_emb"][user], params["item_emb"][pos],
                        params["item_emb"][neg]], user.shape[0], weight=w)
        rec_loss = mf + self.reg_weight * reg
        aux = {"mf": mf, "reg": reg}
        if mode == 0:
            return rec_loss, aux

        if "sub_ell" in extras:
            from dataclasses import replace as _rep
            from recbole_gnn_tpu.ops.ell_spmm import with_ws
            g0 = consts["sub_graph"]
            sub = _rep(g0, weight=extras["sub_weight"],
                       ell=with_ws(g0.ell, extras["sub_ell"]),
                       rev_ell=with_ws(g0.rev_ell, extras["sub_ell_r"]))
        else:
            sub = consts["sub_graph"].with_weight(extras["sub_weight"])
        aug_u_all, _ = self._joint_forward(params, lambda x: spmm(sub, x))
        friend_all, sharing_all = self._user_view_forward(params, consts)

        wmask = w if w is not None else jnp.ones(user.shape[0])
        aug_u = _l2norm(aug_u_all[user])
        social_u = _l2norm(friend_all[user])
        sharing_u = _l2norm(sharing_all[user])
        rec_u = _l2norm(u_all[user])

        def label_prob(e):
            logits = jnp.dot(e, aug_u.T, preferred_element_type=jnp.float32)
            logits = jnp.where(wmask[None, :] > 0, logits, -1e30)
            return jax.nn.softmax(logits, axis=1)

        social_pred = label_prob(social_u)
        sharing_pred = label_prob(sharing_u)
        rec_pred = label_prob(rec_u)

        def pseudo(p1, p2):
            _, idx = jax.lax.top_k((p1 + p2) / 2.0, self.instance_cnt)
            return idx

        friend_pos = pseudo(sharing_pred, rec_pred)
        sharing_pos = pseudo(social_pred, rec_pred)
        rec_pos = pseudo(social_pred, sharing_pred)

        ssl = (self._ssl_loss(aug_u, friend_pos, social_u, wmask) +
               self._ssl_loss(aug_u, sharing_pos, sharing_u, wmask) +
               self._ssl_loss(aug_u, rec_pos, rec_u, wmask))
        aux["ssl"] = ssl
        return rec_loss + self.ssl_weight * ssl, aux
