"""SGL — self-supervised graph learning with stochastic augmentations.

Parity target: reference sgl.py — LightGCN backbone + two augmented
views rebuilt every epoch via train() (:73-80); aug types ND (node
drop), ED (edge drop), RW (per-layer edge drop) with *re-normalized*
sub-graphs (:93-126); sum-reduced BPR + EmbLoss (:147-174) + InfoNCE
over batch users/pos-items against ALL nodes of view 2, sum-reduced
(:176-209).

TPU-first: augmentation never resizes edge lists.  On the dense path
the two views are dense re-normalized matrices rebuilt per epoch on
device (epoch_start); on the sparse path they are per-edge weight
arrays over the static COO (mask → sym_norm re-normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.models.base import GeneralGraphRecommender
from recbole_gnn_tpu.models.init import xavier_uniform
from recbole_gnn_tpu.models.losses import emb_loss, info_nce
from recbole_gnn_tpu.ops.graphops import sym_norm_weights
from recbole_gnn_tpu.ops.spmm import (
    BipartiteDenseGraph, spmm_any, spmm_dense_bipartite)


class SGL(GeneralGraphRecommender):

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.latent_dim = int(config.get("embedding_size", 64))
        self.n_layers = int(config.get("n_layers", 3))
        self.aug_type = str(config["type"] or "ED")
        self.drop_ratio = float(config.get("drop_ratio", 0.1))
        self.ssl_tau = float(config.get("ssl_tau", 0.5))
        self.reg_weight = float(config.get("reg_weight", 1e-5))
        self.ssl_weight = float(config.get("ssl_weight", 0.05))
        # activation_dtype: bfloat16 halves the three propagations'
        # (n_nodes, D) activations + cotangents — the batch-independent
        # footprint that keeps f32 SGL off one 16 GiB chip at web scale
        # (18.2 GiB measured at gowalla shape, results/gowalla.md);
        # bf16 graph propagation is metric-identical on the fixture at
        # 4 decimals (PARITY.md bf16 experiment).  Losses stay f32.
        self.act_dtype = (jnp.bfloat16
                          if str(config["activation_dtype"] or "")
                          .startswith("bf") else None)
        if self.aug_type not in ("ND", "ED", "RW"):
            raise ValueError(f"unknown SGL aug type {self.aug_type!r}")
        # raw interaction endpoints for augmentation (reference :55-57)
        users, items = dataset.user_item_arrays()
        self.consts["aug_users"] = jnp.asarray(users)
        self.consts["aug_items"] = jnp.asarray(items)
        self._is_dense = isinstance(self.consts["graph"], BipartiteDenseGraph)
        if not self._is_dense:
            # map each dst-sorted edge back to its interaction row so an
            # interaction keep-mask can be scattered onto edge weights
            # (mirrors build_graph's stable dst argsort; pallas pad edges
            # map to the sentinel row n_inter, which is always dropped)
            import numpy as np
            n_inter = len(users)
            dst_cat = np.concatenate([items + self.n_users, users])
            order = np.argsort(dst_cat, kind="stable")
            ids = (order % n_inter).astype(np.int32)
            n_pad = self.consts["graph"].n_edges_padded - len(ids)
            if n_pad > 0:
                ids = np.concatenate(
                    [ids, np.full(n_pad, n_inter, np.int32)])
            self.consts["edge_inter_id"] = jnp.asarray(ids)
        self._aug_builder = None

    # -- augmentation ----------------------------------------------------

    def _keep_mask(self, rng, n_inter, users, items):
        if self.aug_type == "ND":
            ku, ki = jax.random.split(rng)
            keep_u = jax.random.uniform(ku, (self.n_users,)) >= self.drop_ratio
            keep_i = jax.random.uniform(ki, (self.n_items,)) >= self.drop_ratio
            return keep_u[users] & keep_i[items]
        return jax.random.uniform(rng, (n_inter,)) >= self.drop_ratio

    def _build_view(self, rng, consts):
        """One augmented view: (n_layers, …) stacked graph weights.

        ``consts`` is an explicit argument (not a closure capture) so
        the interaction arrays stay jit *inputs* — closure-captured
        arrays bake into the HLO as constants and stall compilation."""
        users = consts["aug_users"]
        items = consts["aug_items"]
        n_inter = users.shape[0]
        n_rep = self.n_layers if self.aug_type == "RW" else 1
        keys = jax.random.split(rng, n_rep)
        outs = []
        for k in keys:
            keep = self._keep_mask(k, n_inter, users, items)
            if self._is_dense:
                kf = keep.astype(jnp.float32)
                a_bin = jnp.zeros(
                    (self.n_users, self.n_items)).at[users, items].add(kf)
                deg_u = a_bin.sum(axis=1)
                deg_i = a_bin.sum(axis=0)
                du = jnp.where(deg_u > 0, jax.lax.rsqrt(jnp.maximum(deg_u, 1e-12)), 0.0)
                di = jnp.where(deg_i > 0, jax.lax.rsqrt(jnp.maximum(deg_i, 1e-12)), 0.0)
                outs.append(a_bin * du[:, None] * di[None, :])
            else:
                g = consts["graph"]
                # both directions of a kept interaction survive; map the
                # interaction keep-mask onto dst-sorted edge order (the
                # sentinel row keeps pallas pad edges dead)
                keep_ext = jnp.concatenate(
                    [keep, jnp.zeros((1,), keep.dtype)])
                mask_e = keep_ext[consts["edge_inter_id"]]
                outs.append(sym_norm_weights(g.src, g.dst, g.n_nodes,
                                             mask=mask_e))
        if n_rep == 1:
            outs = outs * self.n_layers
        return jnp.stack(outs, axis=0)

    def _view_ell_ws(self, consts, stacked_w):
        """Per-layer ELL slot weights (fwd + transpose) regathered from
        the per-epoch view weights — hoisted HERE (epoch granularity)
        because the (E_pad,) gathers carry the usual per-row cost and
        must never run per step (ops/ell_spmm.py)."""
        from recbole_gnn_tpu.ops.ell_spmm import reweight_ws
        g = consts["graph"]
        nnz = g.n_edges
        f_layers, r_layers = [], []
        for l in range(self.n_layers):
            wl = stacked_w[l][:nnz]
            f_layers.append(reweight_ws(g.ell, wl))
            r_layers.append(reweight_ws(g.rev_ell, wl))
        # bucket-major stacking: tuple over buckets of (n_layers, n, K)
        f = tuple(jnp.stack([f_layers[l][b] for l in range(self.n_layers)])
                  for b in range(len(f_layers[0])))
        r = tuple(jnp.stack([r_layers[l][b] for l in range(self.n_layers)])
                  for b in range(len(r_layers[0])))
        return f, r

    def _make_extras(self, rng, consts):
        k1, k2 = jax.random.split(rng)
        v1 = self._build_view(k1, consts)
        v2 = self._build_view(k2, consts)
        out = {"view1": v1, "view2": v2}
        if not self._is_dense and consts["graph"].ell is not None:
            out["view1_ell"], out["view1_ell_r"] = self._view_ell_ws(
                consts, v1)
            out["view2_ell"], out["view2_ell_r"] = self._view_ell_ws(
                consts, v2)
        return out

    def init_extras(self, rng):
        return self._make_extras(rng, self.consts)

    def epoch_start(self, epoch, params, consts, extras, rng):
        # views rebuilt every epoch (reference train() override :73-80)
        if self._aug_builder is None:
            self._aug_builder = jax.jit(self._make_extras)
        return self._aug_builder(rng, consts)

    # -- forward ---------------------------------------------------------

    def _propagate_layers(self, params, graph_per_layer):
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        if self.act_dtype is not None:
            x = x.astype(self.act_dtype)
        outs = [x]
        for layer_graph in graph_per_layer:
            x = layer_graph(x)
            outs.append(x)
        final = jnp.mean(jnp.stack(outs, axis=0).astype(jnp.float32),
                         axis=0)
        return final[:self.n_users], final[self.n_users:]

    def _forward_base(self, params, consts):
        g = consts["graph"]
        return self._propagate_layers(
            params, [lambda x, g=g: spmm_any(g, x)] * self.n_layers)

    def _forward_view(self, params, consts, view_weights,
                      ell_ws=None, ell_ws_r=None):
        if self._is_dense:
            layers = [
                (lambda x, a=view_weights[l]: spmm_dense_bipartite(
                    BipartiteDenseGraph(a, self.n_users, self.n_items, 0), x))
                for l in range(self.n_layers)]
        elif ell_ws is not None:
            # per-epoch regathered ELL slot weights ride the extras;
            # the layouts' statics come from the consts graph — the
            # augmented views keep full ELL speed
            from dataclasses import replace as _rep
            from recbole_gnn_tpu.ops.ell_spmm import with_ws
            g = consts["graph"]

            def make(l):
                gl = _rep(
                    g, weight=view_weights[l],
                    ell=with_ws(g.ell, tuple(b[l] for b in ell_ws)),
                    rev_ell=with_ws(g.rev_ell,
                                    tuple(b[l] for b in ell_ws_r)))
                return lambda x: spmm_any(gl, x)

            layers = [make(l) for l in range(self.n_layers)]
        else:
            g = consts["graph"]
            layers = [
                (lambda x, w=view_weights[l]: spmm_any(g.with_weight(w), x))
                for l in range(self.n_layers)]
        return self._propagate_layers(params, layers)

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_emb": xavier_uniform(ku, (self.n_users, self.latent_dim)),
            "item_emb": xavier_uniform(ki, (self.n_items, self.latent_dim)),
        }

    def propagate(self, params, consts, extras):
        return self._forward_base(params, consts)

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        user, pos, neg = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        w = batch.get("weight")
        # three full-graph propagations per step: remat each so the
        # backward recomputes the (n_nodes, D) layer activations
        # instead of keeping 3 graphs × n_layers of them live — at
        # gowalla scale (1.42M nodes) the saved residuals plus the ELL
        # gather transients exceed one chip's HBM (measured,
        # scripts/diag/r4_sgl_gowalla.py); remat trades ~1 extra
        # propagation per graph for ~4 GiB of residuals
        # consts passed as explicit checkpoint args — a closure over
        # traced values leaks tracers out of the remat scope
        u_all, i_all = jax.checkpoint(
            lambda p, c: self._forward_base(p, c))(params, consts)
        view_fn = jax.checkpoint(
            lambda p, c, vw, f, r: self._forward_view(p, c, vw, f, r))
        u1, i1 = view_fn(params, consts, extras["view1"],
                         extras.get("view1_ell"),
                         extras.get("view1_ell_r"))
        u2, i2 = view_fn(params, consts, extras["view2"],
                         extras.get("view2_ell"),
                         extras.get("view2_ell_r"))

        u_e, p_e, n_e = u_all[user], i_all[pos], i_all[neg]
        l1 = -jax.nn.log_sigmoid(
            jnp.sum(u_e * p_e, -1) - jnp.sum(u_e * n_e, -1))
        if w is not None:
            l1 = l1 * w
        bpr = jnp.sum(l1)  # sum-reduced (reference :162)
        reg = emb_loss([params["user_emb"][user], params["item_emb"][pos],
                        params["item_emb"][neg]], user.shape[0], weight=w)

        ssl = (info_nce(u1[user], u2[user], self.ssl_tau, weight=w,
                        all_view2=u2, reduction="sum") +
               info_nce(i1[pos], i2[pos], self.ssl_tau, weight=w,
                        all_view2=i2, reduction="sum"))
        loss = bpr + reg * self.reg_weight + ssl * self.ssl_weight
        return loss, {"bpr": bpr, "reg": reg, "ssl": ssl}
