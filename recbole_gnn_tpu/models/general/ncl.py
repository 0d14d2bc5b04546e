"""NCL — neighborhood-enriched contrastive learning.

Parity target: reference ncl.py — LightGCN backbone propagating
max(n_layers, hyper_layers·2) layers keeping the full list (:93-104);
structure-contrastive ssl_layer_loss between layer-2k and layer-0
embeddings (:135-164); prototype-contrastive ProtoNCE vs k-means
centroids (:106-133) with the E-step run every m_step epochs by the
custom trainer (trainer.py:38-40) and dropped during warm-up
(trainer.py:129-131).

TPU-native: faiss GPU k-means → ops.kmeans (jitted Lloyd matmuls);
E-step is the epoch_start hook; warm-up is loss_mode 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.general.lightgcn import LightGCN
from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss, info_nce
from recbole_gnn_tpu.ops.kmeans import kmeans
from recbole_gnn_tpu.ops.spmm import spmm_any


def _normalize(x):
    from recbole_gnn_tpu.models.init import l2_normalize
    return l2_normalize(x)


class NCL(LightGCN):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.reg_weight = float(config.get("reg_weight", 1e-4))
        self.ssl_temp = float(config.get("ssl_temp", 0.1))
        self.ssl_reg = float(config.get("ssl_reg", 1e-7))
        self.hyper_layers = int(config.get("hyper_layers", 1))
        self.alpha = float(config.get("alpha", 1.0))
        self.proto_reg = float(config.get("proto_reg", 8e-8))
        self.k = int(config.get("num_clusters", 1000))
        self.m_step = int(config.get("m_step", 1))
        self.warm_up_step = int(config.get("warm_up_step", 20))
        self._e_step_jit = None

    # -- prototype E-step -------------------------------------------------

    def init_extras(self, rng):
        d = self.latent_dim
        return {
            "user_centroids": jnp.zeros((self.k, d)),
            "user_2cluster": jnp.zeros((self.n_users,), jnp.int32),
            "item_centroids": jnp.zeros((self.k, d)),
            "item_2cluster": jnp.zeros((self.n_items,), jnp.int32),
        }

    def epoch_start(self, epoch, params, consts, extras, rng):
        if epoch % self.m_step != 0:
            return extras
        if self._e_step_jit is None:
            def e_step(params, rng):
                ku, ki = jax.random.split(rng)
                uc, ua = kmeans(ku, params["user_emb"], self.k)
                ic, ia = kmeans(ki, params["item_emb"], self.k)
                return {
                    "user_centroids": _normalize(uc),
                    "user_2cluster": ua.astype(jnp.int32),
                    "item_centroids": _normalize(ic),
                    "item_2cluster": ia.astype(jnp.int32),
                }
            self._e_step_jit = jax.jit(e_step)
        return self._e_step_jit(params, rng)

    def loss_mode(self, epoch):
        # mode 0 = warm-up: proto loss dropped (reference trainer.py:129)
        return 0 if epoch < self.warm_up_step else 1

    # -- forward ----------------------------------------------------------

    def _forward_list(self, params, consts):
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        layers = [x]
        for _ in range(max(self.n_layers, self.hyper_layers * 2)):
            x = spmm_any(consts["graph"], x)
            layers.append(x)
        final = jnp.mean(jnp.stack(layers[:self.n_layers + 1], axis=0), axis=0)
        return final[:self.n_users], final[self.n_users:], layers

    def propagate(self, params, consts, extras):
        u, i, _ = self._forward_list(params, consts)
        return u, i

    # -- losses -----------------------------------------------------------

    def _ssl_layer_loss(self, current, previous, user, item, w):
        cu, ci = current[:self.n_users], current[self.n_users:]
        pu, pi = previous[:self.n_users], previous[self.n_users:]
        u_loss = info_nce(cu[user], pu[user], self.ssl_temp, weight=w,
                          all_view2=pu, reduction="sum")
        i_loss = info_nce(ci[item], pi[item], self.ssl_temp, weight=w,
                          all_view2=pi, reduction="sum")
        return self.ssl_reg * (u_loss + self.alpha * i_loss)

    def _proto_nce(self, center, extras, user, item, w):
        cu, ci = center[:self.n_users], center[self.n_users:]
        u_loss = info_nce(
            cu[user], extras["user_centroids"][extras["user_2cluster"][user]],
            self.ssl_temp, weight=w, all_view2=extras["user_centroids"],
            reduction="sum")
        i_loss = info_nce(
            ci[item], extras["item_centroids"][extras["item_2cluster"][item]],
            self.ssl_temp, weight=w, all_view2=extras["item_centroids"],
            reduction="sum")
        return self.proto_reg * (u_loss + i_loss)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        u_all, i_all, layers = self._forward_list(params, consts)

        center = layers[0]
        context = layers[self.hyper_layers * 2]
        ssl = self._ssl_layer_loss(context, center, user, pos, w)

        u_e, p_e, n_e = u_all[user], i_all[pos], i_all[neg]
        mf = bpr_loss(jnp.sum(u_e * p_e, -1), jnp.sum(u_e * n_e, -1), w)
        reg = emb_loss([params["user_emb"][user], params["item_emb"][pos],
                        params["item_emb"][neg]], user.shape[0], weight=w)
        loss = mf + self.reg_weight * reg + ssl
        aux = {"mf": mf, "reg": reg, "ssl": ssl}
        if mode == 1:
            proto = self._proto_nce(center, extras, user, pos, w)
            loss = loss + proto
            aux["proto"] = proto
        return loss, aux
