"""DirectAU — alignment + uniformity with a pluggable encoder.

Parity target: reference directau.py — MF or LightGCN encoder
(:34-41, 96-120); loss = mean‖u−i‖² + γ·(uniformity(u)+uniformity(i))/2
with uniformity = log mean exp(−2·pdist²) (:54-73); full-sort uses raw
(MF) or propagated (LightGCN) embeddings, unnormalized (:82-93).
The reference's `predict` references an undefined attribute
(directau.py:75-80, latent bug) — implemented correctly here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import GeneralGraphRecommender
from recbole_gnn_tpu.models.init import xavier_normal
from recbole_gnn_tpu.models.layers import lightgcn_propagate
from recbole_gnn_tpu.models.losses import alignment_loss, uniformity_loss


class DirectAU(GeneralGraphRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.gamma = float(config.get("gamma", 0.5))
        self.encoder_name = str(config["encoder"] or "MF")
        if self.encoder_name not in ("MF", "LightGCN"):
            raise ValueError(f"Non-implemented encoder {self.encoder_name!r}")
        self.n_layers = int(config.get("n_layers", 3))

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": xavier_normal(ku, (self.n_users, self.embedding_size)),
            "item_emb": xavier_normal(ki, (self.n_items, self.embedding_size)),
        }

    def _all_embeddings(self, params, consts):
        if self.encoder_name == "MF":
            return params["user_emb"], params["item_emb"]
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        layers = lightgcn_propagate(consts["graph"], ego, self.n_layers)
        final = jnp.mean(jnp.stack(layers, axis=0), axis=0)
        return final[:self.n_users], final[self.n_users:]

    def propagate(self, params, consts, extras):
        return self._all_embeddings(params, consts)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, item = batch["user_id"], batch["item_id"]
        w = batch.get("weight")
        u_all, i_all = self._all_embeddings(params, consts)
        u_e = u_all[user]
        i_e = i_all[item]
        u_e = u_e / jnp.maximum(jnp.linalg.norm(u_e, axis=-1, keepdims=True), 1e-12)
        i_e = i_e / jnp.maximum(jnp.linalg.norm(i_e, axis=-1, keepdims=True), 1e-12)
        align = alignment_loss(u_e, i_e, w)
        uniform = self.gamma * (uniformity_loss(u_e, w) +
                                uniformity_loss(i_e, w)) / 2.0
        return align + uniform, {"align": align, "uniform": uniform}
