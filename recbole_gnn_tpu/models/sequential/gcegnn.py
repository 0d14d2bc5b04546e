"""GCE-GNN — local session graph + global co-occurrence context.

Parity target: reference gcegnn.py — edge-type-aware local attention
(LocalAggregator :28-43), model-built global top-sample_num
co-occurrence neighbor table (construct_global_graph :134-156, stored
as other_parameter → consts here), hop× session-aware GlobalAggregator
(:46-73, :174-232), reverse-position fusion readout (:158-172).

Dense form: the typed local adjacency becomes four (B, L, L) masks and
the attention is batched matmuls; the edge-message x_j⊙x_i structure
collapses to out_i = x_i ⊙ (α @ x).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from recbole_gnn_tpu.models.base import SequentialRecommender
from recbole_gnn_tpu.models.init import linear, linear_params, split_keys, \
    uniform_pm
from recbole_gnn_tpu.models.losses import bpr_loss, cross_entropy


class GCEGNN(SequentialRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = int(config.get("embedding_size", 64))
        self.leakyrelu_alpha = float(config.get("leakyrelu_alpha", 0.2))
        self.dropout_local = float(config.get("dropout_local", 0.0))
        self.dropout_global = float(config.get("dropout_global", 0.5))
        self.dropout_gcn = float(config.get("dropout_gcn", 0.0))
        self.loss_type = str(config["loss_type"] or "CE")
        self.sample_num = int(config.get("sample_num", 12))
        self.hop = int(config.get("hop", 1))
        if config["build_global_graph"] is not False:
            adj, w = self._construct_global_graph(dataset)
            self.consts["global_adj"] = jnp.asarray(adj)
            self.consts["global_weight"] = jnp.asarray(w)

    def _construct_global_graph(self, dataset):
        """Co-occurrence neighbors: counts of (target, first-4-history)
        pairs both ways, top-sample_num by count per item (reference
        :134-156), vectorized numpy instead of python dict loops."""
        seqs = dataset.inter[dataset.item_list_field]
        tgt = dataset.inter[dataset.iid_field]
        src4 = seqs[:, :4]
        t_rep = np.repeat(tgt, 4)
        s_flat = src4.reshape(-1)
        valid = s_flat > 0
        a = np.concatenate([t_rep[valid], s_flat[valid]])
        b = np.concatenate([s_flat[valid], t_rep[valid]])
        key = a.astype(np.int64) * self.n_items + b
        uniq, counts = np.unique(key, return_counts=True)
        rows = (uniq // self.n_items).astype(np.int64)
        cols = (uniq % self.n_items).astype(np.int64)
        # per row, take top-sample_num by count (desc) — vectorized
        S = self.sample_num
        adj = np.zeros((self.n_items, S), dtype=np.int64)
        wout = np.zeros((self.n_items, S), dtype=np.float32)
        order = np.lexsort((-counts, rows))
        rows_s, cols_s, cnt_s = rows[order], cols[order], counts[order]
        starts = np.searchsorted(rows_s, np.arange(self.n_items))
        pos = np.arange(len(rows_s)) - starts[rows_s]
        keep = pos < S
        adj[rows_s[keep], pos[keep]] = cols_s[keep]
        wout[rows_s[keep], pos[keep]] = cnt_s[keep]
        return adj, wout

    def init_params(self, rng):
        d = self.embedding_size
        stdv = 1.0 / math.sqrt(d)
        ks = split_keys(rng, 7 + self.hop)
        params = {
            "item_emb": uniform_pm(ks[0], (self.n_items, d), stdv),
            "pos_emb": uniform_pm(ks[1], (self.max_seq_len, d), stdv),
            "edge_emb": uniform_pm(ks[2], (4, d), stdv),
            "w1": linear_params(ks[3], 2 * d, d, bias=False, stdv=stdv),
            "w2": linear_params(ks[4], d, 1, bias=False, stdv=stdv),
            "glu1": linear_params(ks[5], d, d, stdv=stdv),
            "glu2": linear_params(ks[6], d, d, bias=False, stdv=stdv),
            "global_agg": [
                {"w_1": uniform_pm(jax.random.fold_in(ks[7 + i], 0),
                                   (d + 1, d), stdv),
                 "w_2": uniform_pm(jax.random.fold_in(ks[7 + i], 1),
                                   (d, 1), stdv),
                 "w_3": uniform_pm(jax.random.fold_in(ks[7 + i], 2),
                                   (2 * d, d), stdv),
                 "bias": uniform_pm(jax.random.fold_in(ks[7 + i], 3),
                                    (d,), stdv)}
                for i in range(self.hop)
            ],
        }
        return params

    def _local_agg(self, params, h, batch):
        """Typed-edge attention (LocalAggregator :28-43), dense."""
        B, L, D = h.shape
        src, dst, attr = batch["edge_src"], batch["edge_dst"], batch["edge_attr"]
        E = src.shape[1]
        evalid = jnp.arange(E)[None, :] < batch["n_edges"][:, None]
        rows = jnp.repeat(jnp.arange(B), E).reshape(B, E)
        # typed masks M[t][b, dst, src]
        masks = []
        for t in range(4):
            sel = (attr == t) & evalid
            m = jnp.zeros((B, L, L)).at[rows, dst, src].max(
                sel.astype(jnp.float32))
            masks.append(m)
        # logits per type: e_t[b, i, j] = leakyrelu(Σ_d h_i h_j a_t)
        wsum = jnp.zeros((B, L, L))
        logits_all = []
        for t in range(4):
            ya = h * params["edge_emb"][t][None, None, :]
            e_t = jnp.einsum("bid,bjd->bij", ya, h)
            e_t = jax.nn.leaky_relu(e_t, negative_slope=self.leakyrelu_alpha)
            logits_all.append(e_t)
        # joint softmax over all (j, t) incident edges of node i
        big = jnp.stack(logits_all, axis=-1)              # (B, L, L, 4)
        mstack = jnp.stack(masks, axis=-1)                # (B, L, L, 4)
        big = jnp.where(mstack > 0, big, -1e30)
        flat = big.reshape(B, L, L * 4)
        alpha = jax.nn.softmax(flat, axis=-1).reshape(B, L, L, 4)
        alpha = alpha * mstack
        w = alpha.sum(axis=-1)                            # (B, L, L)
        # out_i = Σ_{(j,t)} α·h_j — reference message returns
        # e·x_j (add-aggregated), NOT gated by h_i (gcegnn.py:38-43)
        return jnp.einsum("bij,bjd->bid", w, h)

    def _global_agg(self, params, h, batch, rng, train):
        """Session-aware neighbor aggregation over the global table
        (reference forward :190-232), hop levels."""
        B = batch["alias_inputs"].shape[0]
        L = self.max_seq_len
        D = self.embedding_size
        S = self.sample_num
        adj, gw = self.consts["global_adj"], self.consts["global_weight"]
        item_emb = params["item_emb"]

        seq_items = jnp.take_along_axis(batch["x"], batch["alias_inputs"],
                                        axis=1)           # (B, L) item ids
        mask = (seq_items > 0)
        item_neighbors = [seq_items]
        weight_neighbors = []
        support = L
        for _ in range(self.hop):
            flat = item_neighbors[-1].reshape(-1)
            support *= S
            item_neighbors.append(adj[flat].reshape(B, support))
            weight_neighbors.append(gw[flat].reshape(B, support))

        entity_vectors = [item_emb[n] for n in item_neighbors]
        item_e = item_emb[seq_items] * mask[:, :, None]
        sum_item = item_e.sum(axis=1) / jnp.maximum(
            mask.sum(axis=1, keepdims=True), 1.0)         # (B, D)

        for n_hop in range(self.hop):
            nxt = []
            p = params["global_agg"][n_hop]
            for hop_i in range(self.hop - n_hop):
                self_vec = entity_vectors[hop_i]          # (B, M, D)
                neigh = entity_vectors[hop_i + 1].reshape(
                    B, -1, S, D)                          # (B, M, S, D)
                nw = weight_neighbors[hop_i].reshape(B, -1, S)
                extra = jnp.broadcast_to(sum_item[:, None, None, :],
                                         neigh.shape)
                alpha = jnp.einsum(
                    "bmsk,kd->bmsd",
                    jnp.concatenate([extra * neigh, nw[..., None]], axis=-1),
                    p["w_1"])
                alpha = jax.nn.leaky_relu(alpha, negative_slope=0.2)
                alpha = jnp.einsum("bmsd,do->bmso", alpha, p["w_2"])[..., 0]
                alpha = jax.nn.softmax(alpha, axis=-1)[..., None]
                neigh_v = jnp.sum(alpha * neigh, axis=-2)  # (B, M, D)
                out = jnp.concatenate([self_vec, neigh_v], axis=-1)
                if train and self.dropout_gcn > 0:
                    rng, k = jax.random.split(rng)
                    keep = jax.random.bernoulli(
                        k, 1.0 - self.dropout_gcn, out.shape)
                    out = jnp.where(keep, out / (1.0 - self.dropout_gcn), 0.0)
                out = jax.nn.relu(jnp.einsum("bmk,kd->bmd", out, p["w_3"]))
                nxt.append(out)
            entity_vectors = nxt
        return entity_vectors[0][:, :L, :]                # (B, L, D)

    def _fusion(self, params, hidden, mask):
        """Reverse-position fusion readout (reference :158-172)."""
        B, L, D = hidden.shape
        pos = params["pos_emb"][None, :L, :]
        m = mask[:, :, None].astype(hidden.dtype)
        hs = jnp.sum(hidden * m, axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        nh = jnp.tanh(linear(params["w1"],
                             jnp.concatenate([jnp.broadcast_to(pos, hidden.shape),
                                              hidden], axis=-1)))
        nh = jax.nn.sigmoid(linear(params["glu1"], nh) +
                            linear(params["glu2"], hs)[:, None, :])
        beta = linear(params["w2"], nh) * m
        return jnp.sum(beta * hidden, axis=1)

    def seq_output(self, params, batch, rng, train):
        h = params["item_emb"][batch["x"]]
        h = jnp.where((batch["x"] > 0)[:, :, None], h, 0.0)
        h_local = self._local_agg(params, h, batch)
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        h_global = self._global_agg(params, h, batch, k1, train)
        if train and self.dropout_local > 0:
            keep = jax.random.bernoulli(k2, 1.0 - self.dropout_local,
                                        h_local.shape)
            h_local = jnp.where(keep, h_local / (1.0 - self.dropout_local), 0.0)
        if train and self.dropout_global > 0:
            keep = jax.random.bernoulli(k3, 1.0 - self.dropout_global,
                                        h_global.shape)
            h_global = jnp.where(keep,
                                 h_global / (1.0 - self.dropout_global), 0.0)
        h_local_seq = jnp.take_along_axis(
            h_local, batch["alias_inputs"][:, :, None], axis=1)
        seq_items = jnp.take_along_axis(batch["x"], batch["alias_inputs"],
                                        axis=1)
        mask = seq_items > 0
        h_session = h_local_seq + h_global
        return self._fusion(params, h_session, mask)

    def full_scores(self, params, consts, extras, batch, rng, train):
        out = self.seq_output(params, batch, rng, train)
        return jnp.dot(out, params["item_emb"].T,
                       preferred_element_type=jnp.float32)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        w = batch.get("weight")
        if self.loss_type == "BPR":
            out = self.seq_output(params, batch, rng, True)
            loss = bpr_loss(
                jnp.sum(out * params["item_emb"][batch["item_id"]], -1),
                jnp.sum(out * params["item_emb"][batch["neg_item_id"]], -1), w)
        else:
            logits = self.full_scores(params, consts, extras, batch, rng, True)
            loss = cross_entropy(logits, batch["item_id"], w)
        return loss, {"loss": loss}
