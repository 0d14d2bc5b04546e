"""SimGCL — LightGCN + per-layer random noise contrastive views.

Parity target: reference simgcl.py — forward adds sign(e)·ε·norm(noise)
per layer when perturbed (:24-38), layer mean EXCLUDES layer 0
(embeddings_list starts empty, :26); loss = LightGCN BPR+reg +
cl_rate·InfoNCE between two perturbed passes over unique batch
users/items, sum-reduced (:40-60).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.general.lightgcn import LightGCN
from recbole_gnn_tpu.models.losses import cl_nce_masked, masked_unique
from recbole_gnn_tpu.ops.spmm import spmm_any


class SimGCL(LightGCN):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.cl_rate = float(config.get("lambda", 0.5))
        self.eps = float(config.get("eps", 0.1))
        self.temperature = float(config.get("temperature", 0.2))

    def _forward_noise(self, params, consts, rng, perturbed: bool):
        graph = consts["graph"]
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        outs = []
        for _ in range(self.n_layers):
            x = spmm_any(graph, x)
            if perturbed:
                rng, k = jax.random.split(rng)
                noise = jax.random.uniform(k, x.shape)
                noise = noise / jnp.maximum(
                    jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-12)
                x = x + jnp.sign(x) * noise * self.eps
            outs.append(x)
        final = jnp.mean(jnp.stack(outs, axis=0), axis=0)
        return final[:self.n_users], final[self.n_users:]

    def propagate(self, params, consts, extras):
        # eval path: unperturbed — note layer-0 exclusion is preserved
        return self._forward_noise(params, consts, jax.random.PRNGKey(0),
                                   False)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        base, aux = super().calculate_loss(params, consts, extras, batch, rng)
        k1, k2 = jax.random.split(rng)
        u1, i1 = self._forward_noise(params, consts, k1, True)
        u2, i2 = self._forward_noise(params, consts, k2, True)
        uu, umask = masked_unique(batch["user_id"])
        ii, imask = masked_unique(batch["item_id"])
        cl = (cl_nce_masked(u1[uu], u2[uu], self.temperature, umask, "sum") +
              cl_nce_masked(i1[ii], i2[ii], self.temperature, imask, "sum"))
        aux["cl"] = cl
        return base + self.cl_rate * cl, aux
