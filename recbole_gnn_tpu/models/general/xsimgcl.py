"""XSimGCL — single perturbed forward, cross-layer contrastive view.

Parity target: reference xsimgcl.py — one perturbed forward also
returns the layer-`layer_cl` embedding as the CL view (:28-48); loss
tuple (mf, reg·w, cl·rate) summed by the generic trainer (:58-90); CL
mean-reduced over unique batch ids (:56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.general.lightgcn import LightGCN
from recbole_gnn_tpu.models.losses import (
    bpr_loss, cl_nce_masked, emb_loss, masked_unique)
from recbole_gnn_tpu.ops.spmm import spmm_any


class XSimGCL(LightGCN):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.cl_rate = float(config.get("lambda", 0.1))
        self.eps = float(config.get("eps", 0.2))
        self.temperature = float(config.get("temperature", 0.2))
        self.layer_cl = int(config.get("layer_cl", 1))

    def _forward(self, params, consts, rng, perturbed: bool):
        graph = consts["graph"]
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        x_cl = x
        outs = []
        for layer_idx in range(self.n_layers):
            x = spmm_any(graph, x)
            if perturbed:
                rng, k = jax.random.split(rng)
                noise = jax.random.uniform(k, x.shape)
                noise = noise / jnp.maximum(
                    jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-12)
                x = x + jnp.sign(x) * noise * self.eps
            outs.append(x)
            if layer_idx == self.layer_cl - 1:
                x_cl = x
        final = jnp.mean(jnp.stack(outs, axis=0), axis=0)
        return (final[:self.n_users], final[self.n_users:],
                x_cl[:self.n_users], x_cl[self.n_users:])

    def propagate(self, params, consts, extras):
        u, i, _, _ = self._forward(params, consts, jax.random.PRNGKey(0),
                                   False)
        return u, i

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        u_all, i_all, u_cl, i_cl = self._forward(params, consts, rng, True)
        u_e, p_e, n_e = u_all[user], i_all[pos], i_all[neg]
        mf = bpr_loss(jnp.sum(u_e * p_e, -1), jnp.sum(u_e * n_e, -1), w)
        reg = emb_loss(
            [params["user_emb"][user], params["item_emb"][pos],
             params["item_emb"][neg]],
            user.shape[0], require_pow=self.require_pow, weight=w)
        uu, umask = masked_unique(user)
        ii, imask = masked_unique(pos)
        cl = (cl_nce_masked(u_all[uu], u_cl[uu], self.temperature, umask,
                            "mean") +
              cl_nce_masked(i_all[ii], i_cl[ii], self.temperature, imask,
                            "mean"))
        loss = mf + self.reg_weight * reg + self.cl_rate * cl
        return loss, {"mf": mf, "reg": reg, "cl": cl}
