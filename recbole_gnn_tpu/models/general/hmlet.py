"""HMLET — gated mix of linear and non-linear propagation.

Parity target: reference hmlet.py — per-node Gumbel-softmax choice
between the linear LightGCN step and an activated step from the last
non-linear embedding, at layers in gate_layer_ids (:154-177); gating
MLP with BatchNorm+Dropout (:27-84), hard one-hot at eval; BPR + reg
(:179-206).  Trainer behavior (reference trainer.py:147-166): gates
frozen + fixed ori_temp during warm-up, exponential temperature decay
and unfreeze afterwards — expressed here as loss_mode 0/1 (freeze via
stop_gradient) and a temperature value in extras (checkpointed, the
``gum_temp`` other_parameter analog).

BatchNorm note: every forward normalizes over the full node set (the
"batch" IS the whole graph each step), so batch statistics are the
population statistics; running-stat buffers would track the same
values and are omitted.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.general.lightgcn import LightGCN
from recbole_gnn_tpu.models.init import linear, linear_params, split_keys
from recbole_gnn_tpu.models.losses import bpr_loss, emb_loss
from recbole_gnn_tpu.ops.spmm import spmm_any


class HMLET(LightGCN):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.gate_layer_ids = list(config["gate_layer_ids"] or [2, 3])
        self.gating_mlp_dims = list(config["gating_mlp_dims"] or [64, 16, 2])
        self.dropout_ratio = float(config.get("dropout_ratio", 0.2))
        self.activation = str(config["activation_function"] or "elu")
        self.warm_up_epochs = int(config.get("warm_up_epochs", 50))
        self.ori_temp = float(config.get("ori_temp", 0.7))
        self.min_temp = float(config.get("min_temp", 0.01))
        self.gum_temp_decay = float(config.get("gum_temp_decay", 0.005))

    def _act(self, x):
        if self.activation == "elu":
            return jax.nn.elu(x)
        return getattr(jax.nn, self.activation, jax.nn.relu)(x)

    def init_params(self, rng):
        base = super().init_params(jax.random.fold_in(rng, 0))
        gates = []
        keys = split_keys(rng, len(self.gate_layer_ids))
        dims = [2 * self.latent_dim] + self.gating_mlp_dims
        for k in keys:
            lks = split_keys(k, len(dims) - 1)
            layers = []
            for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
                lp = {"lin": linear_params(lks[i], a, b)}
                if i != len(dims) - 2:
                    lp["bn"] = {"g": jnp.ones((b,)), "b": jnp.zeros((b,))}
                layers.append(lp)
            gates.append(layers)
        base["gates"] = gates
        return base

    def init_extras(self, rng):
        return {"gum_temp": jnp.asarray(self.ori_temp)}

    def epoch_start(self, epoch, params, consts, extras, rng):
        if epoch > self.warm_up_epochs:
            t = self.ori_temp * math.exp(
                -self.gum_temp_decay * (epoch - self.warm_up_epochs))
            extras = dict(extras, gum_temp=jnp.asarray(max(t, self.min_temp)))
        return extras

    def loss_mode(self, epoch):
        # mode 0: warm-up — gating nets frozen (reference freezes their
        # params via requires_grad, trainer.py:163-165)
        return 0 if epoch <= self.warm_up_epochs else 1

    def _gating(self, gate_params, feat, temp, rng, train: bool):
        x = feat
        for i, lp in enumerate(gate_params):
            x = linear(lp["lin"], x)
            if "bn" in lp:
                mu = jnp.mean(x, axis=0, keepdims=True)
                var = jnp.var(x, axis=0, keepdims=True)
                x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * lp["bn"]["g"] \
                    + lp["bn"]["b"]
                if train and self.dropout_ratio > 0:
                    rng, k = jax.random.split(rng)
                    keep = jax.random.bernoulli(
                        k, 1.0 - self.dropout_ratio, x.shape)
                    x = jnp.where(keep, x / (1.0 - self.dropout_ratio), 0.0)
                x = jax.nn.relu(x)
        logits = x  # (N, 2)
        rng, k = jax.random.split(rng)
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(k, logits.shape) + 1e-20) + 1e-20)
        y = jax.nn.softmax((logits + gumbel) / temp, axis=-1)
        if not train:
            hard = (y == jnp.max(y, axis=-1, keepdims=True)).astype(y.dtype)
            y = jax.lax.stop_gradient(hard - y) + y
        return y  # (N, 2) choice weights

    def _forward(self, params, consts, extras, rng, train: bool,
                 freeze_gates: bool):
        graph = consts["graph"]
        gates = params["gates"]
        if freeze_gates:
            gates = jax.lax.stop_gradient(gates)
        temp = extras["gum_temp"]
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        embeddings = [x]
        non_lin = [x]
        for layer_idx in range(self.n_layers):
            lin_emb = spmm_any(graph, x)
            if layer_idx not in self.gate_layer_ids:
                x = lin_emb
            else:
                gid = self.gate_layer_ids.index(layer_idx)
                nl_emb = self._act(spmm_any(graph, non_lin[gid]))
                rng, k = jax.random.split(rng)
                gate = self._gating(
                    gates[gid], jnp.concatenate([lin_emb, nl_emb], axis=-1),
                    temp, k, train)
                x = gate[:, 0:1] * lin_emb + gate[:, 1:2] * nl_emb
                non_lin.append(x)
            embeddings.append(x)
        final = jnp.mean(jnp.stack(embeddings, axis=0), axis=0)
        return final[:self.n_users], final[self.n_users:]

    def propagate(self, params, consts, extras):
        return self._forward(params, consts, extras, jax.random.PRNGKey(0),
                             False, False)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        u_all, i_all = self._forward(params, consts, extras, rng, True,
                                     freeze_gates=(mode == 0))
        u_e, p_e, n_e = u_all[user], i_all[pos], i_all[neg]
        mf = bpr_loss(jnp.sum(u_e * p_e, -1), jnp.sum(u_e * n_e, -1), w)
        reg = emb_loss([params["user_emb"][user], params["item_emb"][pos],
                        params["item_emb"][neg]], user.shape[0],
                       require_pow=self.require_pow, weight=w)
        return mf + self.reg_weight * reg, {"mf": mf, "reg": reg}
