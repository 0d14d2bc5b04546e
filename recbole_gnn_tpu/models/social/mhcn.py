"""MHCN — multi-channel hypergraph convolution with motif adjacencies.

Parity target: reference social_recommender/mhcn.py — 10 triangle/motif
adjacencies A1..A10 from scipy sparse algebra over social S and
interaction Y (:129-158), aggregated into 3 row-normalized hypergraph
channels H_s/H_j/H_p; per layer: 3 channel convs + attention mixing +
bipartite item/user convs with self-gating per channel (:160-215);
hierarchical MIM self-supervision with row / row-col shuffles
(:217-241); BPR + ssl_reg·MIM + reg.

Motif algebra stays host-side scipy at preprocessing (SURVEY.md §2.6)
and never densifies: the channel / interaction matrices go to device as
dense MXU blocks only under ``dense_graph_max_entries``, as sparse COO
Graphs above it (reference mhcn.py:129-166 stays sparse throughout),
so the model scales past 100k users.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from recbole_gnn_tpu.models.base import SocialRecommender
from recbole_gnn_tpu.models.init import linear, linear_params, normal_init, \
    split_keys, xavier_uniform
from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.spmm import matvec_any


class MHCN(SocialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.n_layers = int(config.get("n_layers", 2))
        self.ssl_reg = float(config.get("ssl_reg", 1e-5))
        self.reg_weight = float(config.get("reg_weight", 1e-5))

        from recbole_gnn_tpu.models.social.common import to_device_matrix

        h_s, h_j, h_p = self._motif_matrices(dataset)
        self.consts["H_s"] = to_device_matrix(h_s, config)
        self.consts["H_j"] = to_device_matrix(h_j, config)
        self.consts["H_p"] = to_device_matrix(h_p, config)

        users, items = dataset.user_item_arrays()
        deg_u = np.bincount(users, minlength=self.n_users).astype(np.float64)
        deg_i = np.bincount(items, minlength=self.n_items).astype(np.float64)
        w = 1.0 / np.sqrt(np.maximum(deg_u[users] * deg_i[items], 1e-12))
        r = sp.coo_matrix((w.astype(np.float32), (users, items)),
                          shape=(self.n_users, self.n_items)).tocsr()
        # both propagation directions as separate device matrices (the
        # dense path transposed R; a Graph carries one direction each)
        self.consts["R_ui"] = to_device_matrix(r, config)
        self.consts["R_iu"] = to_device_matrix(r.T.tocsr(), config)

    def _motif_matrices(self, dataset):
        """A1..A10 motif algebra (reference get_motif_adj_matrix
        :129-158), scipy host-side; returns SPARSE row-normalized
        H_s, H_j, H_p."""
        s_src, s_dst, s_val = dataset.net_coo()
        u_arr, i_arr, y_val = dataset.inter_coo()
        n = self.n_users
        S = sp.coo_matrix((s_val, (s_src, s_dst)),
                          shape=(n, n)).tocsr()
        Y = sp.coo_matrix((y_val, (u_arr, i_arr)),
                          shape=(n, self.n_items)).tocsr()
        B = S.multiply(S.T)
        U = S - B
        C1 = (U.dot(U)).multiply(U.T)
        A1 = C1 + C1.T
        C2 = (B.dot(U)).multiply(U.T) + (U.dot(B)).multiply(U.T) + \
            (U.dot(U)).multiply(B)
        A2 = C2 + C2.T
        C3 = (B.dot(B)).multiply(U) + (B.dot(U)).multiply(B) + \
            (U.dot(B)).multiply(B)
        A3 = C3 + C3.T
        A4 = (B.dot(B)).multiply(B)
        C5 = (U.dot(U)).multiply(U) + (U.dot(U.T)).multiply(U) + \
            (U.T.dot(U)).multiply(U)
        A5 = C5 + C5.T
        A6 = (U.dot(B)).multiply(U) + (B.dot(U.T)).multiply(U.T) + \
            (U.T.dot(U)).multiply(B)
        A7 = (U.T.dot(B)).multiply(U.T) + (B.dot(U)).multiply(U) + \
            (U.dot(U.T)).multiply(B)
        A8 = (Y.dot(Y.T)).multiply(B)
        A9 = (Y.dot(Y.T)).multiply(U)
        A9 = A9 + A9.T
        A10 = Y.dot(Y.T) - A8 - A9

        from recbole_gnn_tpu.models.social.common import row_normalize

        H_s = row_normalize(A1 + A2 + A3 + A4 + A5 + A6 + A7)
        H_j = row_normalize(A8 + A9)
        A10 = sp.csr_matrix(A10)
        A10.data = A10.data * (A10.data > 1)   # reference H_p·(H_p > 1)
        A10.eliminate_zeros()
        H_p = row_normalize(A10)
        return H_s, H_j, H_p

    def init_params(self, rng):
        d = self.embedding_size
        ks = split_keys(rng, 12)
        gate = lambda k: {"lin": linear_params(k, d, d)}
        return {
            "user_emb": xavier_uniform(ks[0], (self.n_users, d)),
            "item_emb": xavier_uniform(ks[1], (self.n_items, d)),
            "gating_c1": gate(ks[2]), "gating_c2": gate(ks[3]),
            "gating_c3": gate(ks[4]), "gating_simple": gate(ks[5]),
            "ss_gating_c1": gate(ks[6]), "ss_gating_c2": gate(ks[7]),
            "ss_gating_c3": gate(ks[8]),
            "att_mat": normal_init(ks[9], (d, d), 1.0),
            "att_vec": normal_init(ks[10], (1, d), 1.0),
        }

    @staticmethod
    def _gate(p, x):
        return x * jax.nn.sigmoid(linear(p["lin"], x))

    def _attention(self, params, *embs):
        weights = [jnp.sum(params["att_vec"] * jnp.dot(
            e, params["att_mat"], preferred_element_type=jnp.float32),
            axis=1) for e in embs]
        score = jax.nn.softmax(jnp.stack(weights, axis=0), axis=0)
        stacked = jnp.stack(embs, axis=0)
        return jnp.sum(stacked * score[:, :, None], axis=0)

    @staticmethod
    def _l2norm(x):
        from recbole_gnn_tpu.models.init import l2_normalize
        return l2_normalize(x)

    def propagate(self, params, consts, extras):
        u = params["user_emb"]
        item_embeddings = params["item_emb"]
        c1 = self._gate(params["gating_c1"], u)
        c2 = self._gate(params["gating_c2"], u)
        c3 = self._gate(params["gating_c3"], u)
        simple = self._gate(params["gating_simple"], u)
        all_c1, all_c2, all_c3 = [c1], [c2], [c3]
        all_simple = [simple]
        all_i = [item_embeddings]

        for _ in range(self.n_layers):
            mixed = self._attention(params, c1, c2, c3) + simple / 2.0
            c1 = matvec_any(consts["H_s"], c1)
            all_c1.append(self._l2norm(c1))
            c2 = matvec_any(consts["H_j"], c2)
            all_c2.append(self._l2norm(c2))
            c3 = matvec_any(consts["H_p"], c3)
            all_c3.append(self._l2norm(c3))
            new_items = matvec_any(consts["R_iu"], mixed)
            all_i.append(self._l2norm(new_items))
            simple = matvec_any(consts["R_ui"], item_embeddings)
            all_simple.append(self._l2norm(simple))
            item_embeddings = new_items

        c1 = sum(all_c1)
        c2 = sum(all_c2)
        c3 = sum(all_c3)
        simple = sum(all_simple)
        items = sum(all_i)
        users = self._attention(params, c1, c2, c3) + simple / 2.0
        return users, items

    def _mim(self, params, consts, user_all, h_key, gate_key, rng):
        """Hierarchical mutual-information self-supervision
        (reference :217-241), sum-reduced."""
        emb = self._gate(params[gate_key], user_all)
        edge = matvec_any(consts[h_key], emb)
        k1, k2, k3 = jax.random.split(rng, 3)
        perm_r = jax.random.permutation(k1, emb.shape[0])
        perm_r2 = jax.random.permutation(k2, emb.shape[0])
        perm_c = jax.random.permutation(k3, emb.shape[1])

        def score(a, b):
            return jnp.sum(a * b, axis=1)

        rc_shuffled = edge[:, perm_c][perm_r2]
        pos = score(emb, edge)
        neg1 = score(emb[perm_r], edge)
        neg2 = score(rc_shuffled, emb)
        local = jnp.sum(-jax.nn.log_sigmoid(pos - neg1)
                        - jax.nn.log_sigmoid(neg1 - neg2))
        graph = jnp.mean(edge, axis=0, keepdims=True)
        pos_g = score(edge, graph)
        neg_g = score(rc_shuffled, graph)
        glob = jnp.sum(-jax.nn.log_sigmoid(pos_g - neg_g))
        return local + glob

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        u_all, i_all = self.propagate(params, consts, extras)
        u_e, p_e, n_e = u_all[user], i_all[pos], i_all[neg]
        mf = bpr_loss(jnp.sum(u_e * p_e, -1), jnp.sum(u_e * n_e, -1), w)

        k1, k2, k3 = jax.random.split(rng, 3)
        ss = (self._mim(params, consts, u_all, "H_s", "ss_gating_c1", k1) +
              self._mim(params, consts, u_all, "H_j", "ss_gating_c2", k2) +
              self._mim(params, consts, u_all, "H_p", "ss_gating_c3", k3))

        reg = emb_loss([params["user_emb"][user], params["item_emb"][pos],
                        params["item_emb"][neg]], user.shape[0], weight=w)
        loss = mf + self.ssl_reg * ss + self.reg_weight * reg
        return loss, {"mf": mf, "ssl": ss, "reg": reg}
