"""SGNN-HN — star graph neural network with highway blending.

Parity target: reference sgnnhn.py — virtual star node initialized as
the mean-pool of session nodes; per step: SRGNNCell, star-gated blend
(σ(h·s/√d)), attentive star update (:79-116); positional embeddings;
custom layer_norm (:29-34) and σ=scale scaled normalized logits.

PAD-slot parity: the reference's per-session node set includes ONE pad
node whenever the session is shorter than max length (torch.unique over
the padded row, dataset.py:122-124), and that node participates in the
star pooling/softmax as an isolated node.  The dense layout reproduces
this by including exactly slot n_nodes (which holds PAD) in the star
mask when padding exists.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import linear, linear_params, split_keys, \
    uniform_pm
from recbole_gnn_tpu.models.layers import srgnn_cell_params
from recbole_gnn_tpu.models.losses import bpr_loss, cross_entropy
from recbole_gnn_tpu.models.sequential.common import (
    gather_seq_hidden, last_hidden, node_embeddings, seq_mask,
    session_dense_adj, srgnn_cell_dense)


def star_blend_step(hidden, star, smask, d):
    """One star-graph blend + attentive star update (reference
    sgnnhn.py:79-100): α = σ(h·s/√d) blends node states toward the
    star; the star is refreshed by masked softmax attention over the
    blended nodes (att_out :79-86).  Extracted for value-level golden
    testing (tests/test_golden_torch.py)."""
    import math as _math
    sim = jnp.sum(hidden * star[:, None, :], axis=-1,
                  keepdims=True) / _math.sqrt(d)
    alpha = jax.nn.sigmoid(sim)
    hidden = (1.0 - alpha) * hidden + alpha * star[:, None, :]
    sim2 = jnp.sum(hidden * star[:, None, :], axis=-1)
    sim2 = jnp.where(smask > 0, sim2, -1e30)
    att = jax.nn.softmax(sim2, axis=1)
    star = jnp.sum(att[:, :, None] * hidden, axis=1)
    return hidden, star


def sgnnhn_layer_norm(x):
    """Reference's custom layer_norm (:29-34): center then L2-normalize."""
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    return x / jnp.maximum(
        jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)),
        1e-12)


class SGNNHN(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.step = int(config.get("step", 6))
        self.scale = float(config.get("scale", 12.0))
        self.loss_type = str(config["loss_type"] or "CE")

    def init_params(self, rng):
        d = self.embedding_size
        stdv = 1.0 / math.sqrt(d)
        ks = split_keys(rng, 8)
        return {
            "item_emb": uniform_pm(ks[0], (self.n_items, d), stdv),
            "pos_emb": uniform_pm(ks[1], (self.max_seq_len, d), stdv),
            "cell": srgnn_cell_params(ks[2], d),
            "linear_one": linear_params(ks[3], d, d, stdv=stdv),
            "linear_two": linear_params(ks[4], d, d, stdv=stdv),
            "linear_three": linear_params(ks[5], d, d, stdv=stdv),
            "linear_four": linear_params(ks[6], d, 1, bias=False, stdv=stdv),
            "linear_transform": linear_params(ks[7], 2 * d, d, stdv=stdv),
        }

    @staticmethod
    def _star_mask(batch):
        """(B, L) node mask including one PAD slot when padding exists."""
        L = batch["x"].shape[1]
        n = batch["n_nodes"]
        extra = (n < L).astype(n.dtype)
        return jnp.arange(L)[None, :] < (n + extra)[:, None]

    def seq_output(self, params, batch):
        d = self.embedding_size
        hidden = node_embeddings(params["item_emb"], batch)
        a_in, a_out = session_dense_adj(batch)
        smask = self._star_mask(batch).astype(jnp.float32)
        cnt = jnp.maximum(smask.sum(axis=1, keepdims=True), 1.0)
        star = jnp.sum(hidden * smask[:, :, None], axis=1) / cnt  # (B, D)

        for _ in range(self.step):
            hidden = srgnn_cell_dense(params["cell"], hidden, a_in, a_out)
            hidden, star = star_blend_step(hidden, star, smask, d)

        seq_hidden = gather_seq_hidden(hidden, batch)
        L = seq_hidden.shape[1]
        seq_hidden = seq_hidden + params["pos_emb"][None, :L, :]
        mask = seq_mask(batch)
        ht = last_hidden(seq_hidden, batch["item_seq_len"])
        q1 = linear(params["linear_one"], ht)[:, None, :]
        q2 = linear(params["linear_two"], seq_hidden)
        q3 = linear(params["linear_three"], star)[:, None, :]
        alpha = linear(params["linear_four"], jax.nn.sigmoid(q1 + q2 + q3))
        a = jnp.sum(alpha * seq_hidden * mask[:, :, None], axis=1)
        out = linear(params["linear_transform"],
                     jnp.concatenate([a, ht], axis=-1))
        return sgnnhn_layer_norm(out)

    def full_scores(self, params, consts, extras, batch, rng, train):
        out = self.seq_output(params, batch)
        items = sgnnhn_layer_norm(params["item_emb"])
        return self.scale * jnp.dot(out, items.T,
                                    preferred_element_type=jnp.float32)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        w = batch.get("weight")
        if self.loss_type == "BPR":
            out = self.seq_output(params, batch)
            pos_e = sgnnhn_layer_norm(params["item_emb"][batch["item_id"]])
            neg_e = sgnnhn_layer_norm(params["item_emb"][batch["neg_item_id"]])
            loss = bpr_loss(self.scale * jnp.sum(out * pos_e, -1),
                            self.scale * jnp.sum(out * neg_e, -1), w)
        else:
            logits = self.full_scores(params, consts, extras, batch, rng, True)
            loss = cross_entropy(logits, batch["item_id"], w)
        return loss, {"loss": loss}
