"""Plain-torch twins of the reference models' TRAINING SEMANTICS.

These replicate what the reference (/root/reference) computes — model
forward + loss + init family + optimizer — in dependency-free torch
(no PyG/recbole/torch_sparse in this env), so a twin trained on the
SAME splits/batches as this framework gives end-to-end quality-parity
evidence (VERDICT r3 "Next round" #2).  Message passing uses
torch.sparse.mm / index_add in place of PyG propagate — numerically
the same aggregation.

Semantics sources (cited per class):
  lightgcn.py:70-110, ngcf.py:73-124 + layers.py BiGNNConv:41-67,
  sgl.py:82-209, simgcl.py:24-60, srgnn.py:86-122 + layers.py
  SRGNNConv/SRGNNCell:71-114, ssl4rec.py:50-163.

recbole loss semantics ([recbole] recbole/model/loss.py):
  BPRLoss: -log(1e-10 + sigmoid(pos - neg)), MEAN
  EmbLoss: sum_e ||e||_p / B    (require_pow: sum_e ||e||_p^p / p / B)
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def bpr_loss(pos, neg, gamma=1e-10):
    return -torch.log(gamma + torch.sigmoid(pos - neg)).mean()


def emb_loss(embs, batch_size, require_pow=False, norm=2):
    if require_pow:
        total = sum(torch.norm(e, p=norm) ** norm for e in embs)
        return total / norm / batch_size
    return sum(torch.norm(e, p=norm) for e in embs) / batch_size


def xavier_normal_all(module):
    """[recbole] xavier_normal_initialization: Embedding + Linear
    weights xavier-normal, Linear bias zero."""
    for m in module.modules():
        if isinstance(m, nn.Embedding):
            nn.init.xavier_normal_(m.weight.data)
        elif isinstance(m, nn.Linear):
            nn.init.xavier_normal_(m.weight.data)
            if m.bias is not None:
                nn.init.constant_(m.bias.data, 0)


def xavier_uniform_all(module):
    for m in module.modules():
        if isinstance(m, nn.Embedding):
            nn.init.xavier_uniform_(m.weight.data)
        elif isinstance(m, nn.Linear):
            nn.init.xavier_uniform_(m.weight.data)
            if m.bias is not None:
                nn.init.constant_(m.bias.data, 0)


def sym_norm_adj(users, items, n_users, n_items) -> torch.Tensor:
    """D^-1/2 A D^-1/2 of the lifted square U-I graph, both directions,
    no self loops (reference dataset.py get_norm_adj_mat:60-79), as a
    coalesced torch.sparse COO tensor."""
    n = n_users + n_items
    src = np.concatenate([users, items + n_users])
    dst = np.concatenate([items + n_users, users])
    deg = np.bincount(dst, minlength=n).astype(np.float64)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    w = (dinv[src] * dinv[dst]).astype(np.float32)
    idx = torch.from_numpy(np.stack([dst, src]))  # rows aggregate src
    return torch.sparse_coo_tensor(
        idx, torch.from_numpy(w), (n, n)).coalesce()


class TwinLightGCN(nn.Module):
    """reference lightgcn.py:36-110."""

    def __init__(self, n_users, n_items, cfg, adj):
        super().__init__()
        self.n_users, self.n_items = n_users, n_items
        self.n_layers = int(cfg["n_layers"])
        self.reg_weight = float(cfg["reg_weight"])
        self.require_pow = bool(cfg["require_pow"])
        d = int(cfg["embedding_size"])
        self.user_embedding = nn.Embedding(n_users, d)
        self.item_embedding = nn.Embedding(n_items, d)
        self.adj = adj
        xavier_uniform_all(self)  # reference lightgcn.py:56 xavier_uniform

    def propagate(self):
        x = torch.cat([self.user_embedding.weight,
                       self.item_embedding.weight])
        outs = [x]
        for _ in range(self.n_layers):
            x = torch.sparse.mm(self.adj, x)
            outs.append(x)
        final = torch.stack(outs, 1).mean(1)
        return final[:self.n_users], final[self.n_users:]

    def loss(self, batch):
        u, p, n = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        ua, ia = self.propagate()
        ue, pe, ne = ua[u], ia[p], ia[n]
        mf = bpr_loss((ue * pe).sum(-1), (ue * ne).sum(-1))
        reg = emb_loss([self.user_embedding(u), self.item_embedding(p),
                        self.item_embedding(n)], len(u),
                       require_pow=self.require_pow)
        return mf + self.reg_weight * reg


class TwinNGCF(nn.Module):
    """reference ngcf.py:35-124; BiGNNConv = lin1(prop + x) +
    lin2(prop * x) (layers.py:41-67); per layer LeakyReLU(0.2) →
    Dropout(message_dropout) → F.normalize; concat all layers incl.
    ego; reg on PROPAGATED embeddings."""

    def __init__(self, n_users, n_items, cfg, adj):
        super().__init__()
        self.n_users, self.n_items = n_users, n_items
        d = int(cfg["embedding_size"])
        dims = [d] + list(cfg["hidden_size_list"])
        self.message_dropout = float(cfg["message_dropout"])
        self.reg_weight = float(cfg["reg_weight"])
        self.user_embedding = nn.Embedding(n_users, d)
        self.item_embedding = nn.Embedding(n_items, d)
        self.lin1 = nn.ModuleList(
            [nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])])
        self.lin2 = nn.ModuleList(
            [nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])])
        self.adj = adj
        xavier_normal_all(self)  # reference ngcf.py:59 xavier_normal

    def propagate(self, train=False):
        x = torch.cat([self.user_embedding.weight,
                       self.item_embedding.weight])
        outs = [x]
        for l1, l2 in zip(self.lin1, self.lin2):
            prop = torch.sparse.mm(self.adj, x)
            x = l1(prop + x) + l2(prop * x)
            x = F.leaky_relu(x, negative_slope=0.2)
            x = F.dropout(x, self.message_dropout, training=train)
            x = F.normalize(x, p=2, dim=1)
            outs.append(x)
        allx = torch.cat(outs, 1)
        return allx[:self.n_users], allx[self.n_users:]

    def loss(self, batch):
        u, p, n = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        ua, ia = self.propagate(train=True)
        ue, pe, ne = ua[u], ia[p], ia[n]
        mf = bpr_loss((ue * pe).sum(-1), (ue * ne).sum(-1))
        reg = emb_loss([ue, pe, ne], len(u))
        return mf + self.reg_weight * reg


class TwinSGL(nn.Module):
    """reference sgl.py:43-240 — LightGCN backbone + two per-epoch
    augmented views; SUM-reduced BPR + EmbLoss-on-ego; SUM-reduced
    InfoNCE of batch users / pos items vs ALL rows of view 2."""

    def __init__(self, n_users, n_items, cfg, adj, users, items):
        super().__init__()
        self.n_users, self.n_items = n_users, n_items
        self.n_layers = int(cfg["n_layers"])
        self.aug_type = str(cfg["type"])
        self.drop_ratio = float(cfg["drop_ratio"])
        self.ssl_tau = float(cfg["ssl_tau"])
        self.reg_weight = float(cfg["reg_weight"])
        self.ssl_weight = float(cfg["ssl_weight"])
        d = int(cfg["embedding_size"])
        self.user_embedding = nn.Embedding(n_users, d)
        self.item_embedding = nn.Embedding(n_items, d)
        self.adj = adj
        self._users, self._items = users, items
        self.sub1 = self.sub2 = None
        xavier_uniform_all(self)  # reference sgl.py:71 xavier_uniform

    def _aug_adj(self, rng):
        """One augmented re-normalized adjacency (sgl.py:93-126)."""
        u, i = self._users, self._items
        if self.aug_type == "ND":
            du = rng.choice(self.n_users,
                            int(self.n_users * self.drop_ratio),
                            replace=False)
            di = rng.choice(self.n_items,
                            int(self.n_items * self.drop_ratio),
                            replace=False)
            keep = ~(np.isin(u, du) | np.isin(i, di))
            u, i = u[keep], i[keep]
        else:  # ED / RW: keep (1 - ratio) of interactions
            keep = rng.choice(len(u), int(len(u) * (1 - self.drop_ratio)),
                              replace=False)
            u, i = u[keep], i[keep]
        return sym_norm_adj(u, i, self.n_users, self.n_items)

    def graph_construction(self, rng):
        """Called once per epoch (reference train() override :73-80)."""
        n_rep = self.n_layers if self.aug_type == "RW" else 1
        s1 = [self._aug_adj(rng) for _ in range(n_rep)]
        s2 = [self._aug_adj(rng) for _ in range(n_rep)]
        self.sub1 = (s1 * self.n_layers)[:self.n_layers]
        self.sub2 = (s2 * self.n_layers)[:self.n_layers]

    def _fwd(self, adjs=None):
        x = torch.cat([self.user_embedding.weight,
                       self.item_embedding.weight])
        outs = [x]
        for k in range(self.n_layers):
            a = self.adj if adjs is None else adjs[k]
            x = torch.sparse.mm(a, x)
            outs.append(x)
        final = torch.stack(outs, 1).mean(1)
        return final[:self.n_users], final[self.n_users:]

    def propagate(self):
        return self._fwd()

    @staticmethod
    def _ssl(e1, e2, all2, tau):
        v1, v2 = F.normalize(e1, dim=1), F.normalize(e2, dim=1)
        a2 = F.normalize(all2, dim=1)
        pos = torch.exp((v1 * v2).sum(1) / tau)
        den = torch.exp(v1 @ a2.T / tau).sum(1)
        return -torch.log(pos / den).sum()

    def loss(self, batch):
        u, p, n = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        ua, ia = self._fwd()
        u1, i1 = self._fwd(self.sub1)
        u2, i2 = self._fwd(self.sub2)
        ue, pe, ne = ua[u], ia[p], ia[n]
        l1 = -F.logsigmoid((ue * pe).sum(1) - (ue * ne).sum(1)).sum()
        l2 = emb_loss([self.user_embedding(u), self.item_embedding(p),
                       self.item_embedding(n)], len(u))
        ssl = (self._ssl(u1[u], u2[u], u2, self.ssl_tau)
               + self._ssl(i1[p], i2[p], i2, self.ssl_tau))
        return l1 + l2 * self.reg_weight + ssl * self.ssl_weight


class TwinSimGCL(TwinLightGCN):
    """reference simgcl.py — LightGCN + noise-perturbed CL views;
    layer MEAN EXCLUDES layer 0 in the perturbed/plain forward."""

    def __init__(self, n_users, n_items, cfg, adj):
        super().__init__(n_users, n_items, cfg, adj)
        self.cl_rate = float(cfg["lambda"])
        self.eps = float(cfg["eps"])
        self.temperature = float(cfg["temperature"])

    def _fwd(self, perturbed=False):
        x = torch.cat([self.user_embedding.weight,
                       self.item_embedding.weight])
        outs = []  # NOTE: layer 0 excluded (simgcl.py:26)
        for _ in range(self.n_layers):
            x = torch.sparse.mm(self.adj, x)
            if perturbed:
                noise = F.normalize(torch.rand_like(x), dim=-1)
                x = x + torch.sign(x) * noise * self.eps
            outs.append(x)
        final = torch.stack(outs, 1).mean(1)
        return final[:self.n_users], final[self.n_users:]

    def propagate(self):
        return self._fwd()

    def _cl(self, x1, x2):
        x1, x2 = F.normalize(x1, dim=-1), F.normalize(x2, dim=-1)
        pos = torch.exp((x1 * x2).sum(-1) / self.temperature)
        den = torch.exp(x1 @ x2.T / self.temperature).sum(1)
        return -torch.log(pos / den).sum()

    def loss(self, batch):
        u, p, n = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        ua, ia = self._fwd()
        ue, pe, ne = ua[u], ia[p], ia[n]
        mf = bpr_loss((ue * pe).sum(-1), (ue * ne).sum(-1))
        reg = emb_loss([self.user_embedding(u), self.item_embedding(p),
                        self.item_embedding(n)], len(u),
                       require_pow=self.require_pow)
        uu, pu = torch.unique(u), torch.unique(p)
        u1, i1 = self._fwd(perturbed=True)
        u2, i2 = self._fwd(perturbed=True)
        cl = self._cl(u1[uu], u2[uu]) + self._cl(i1[pu], i2[pu])
        return mf + self.reg_weight * reg + self.cl_rate * cl


class TwinXSimGCL(TwinSimGCL):
    """reference xsimgcl.py — ONE perturbed forward; the layer mean
    (layer 0 EXCLUDED, like SimGCL) is also what BPR trains on; the CL
    view is the perturbed layer-``layer_cl`` embedding; CL is
    MEAN-reduced (xsimgcl.py calculate_cl_loss) unlike SimGCL's sum."""

    def __init__(self, n_users, n_items, cfg, adj):
        super().__init__(n_users, n_items, cfg, adj)
        self.layer_cl = int(cfg["layer_cl"])

    def _fwd_x(self, perturbed=False):
        x = torch.cat([self.user_embedding.weight,
                       self.item_embedding.weight])
        x_cl = x
        outs = []
        for li in range(self.n_layers):
            x = torch.sparse.mm(self.adj, x)
            if perturbed:
                noise = F.normalize(torch.rand_like(x), dim=-1)
                x = x + torch.sign(x) * noise * self.eps
            outs.append(x)
            if li == self.layer_cl - 1:
                x_cl = x
        final = torch.stack(outs, 1).mean(1)
        return (final[:self.n_users], final[self.n_users:],
                x_cl[:self.n_users], x_cl[self.n_users:])

    def propagate(self):
        ua, ia, _, _ = self._fwd_x(False)
        return ua, ia

    def _cl_mean(self, x1, x2):
        x1, x2 = F.normalize(x1, dim=-1), F.normalize(x2, dim=-1)
        pos = torch.exp((x1 * x2).sum(-1) / self.temperature)
        den = torch.exp(x1 @ x2.T / self.temperature).sum(1)
        return -torch.log(pos / den).mean()

    def loss(self, batch):
        u, p, n = batch["user_id"], batch["item_id"], batch["neg_item_id"]
        ua, ia, ua_cl, ia_cl = self._fwd_x(perturbed=True)
        ue, pe, ne = ua[u], ia[p], ia[n]   # BPR on the PERTURBED mean
        mf = bpr_loss((ue * pe).sum(-1), (ue * ne).sum(-1))
        reg = emb_loss([self.user_embedding(u), self.item_embedding(p),
                        self.item_embedding(n)], len(u),
                       require_pow=self.require_pow)
        uu, pu = torch.unique(u), torch.unique(p)
        cl = (self._cl_mean(ua[uu], ua_cl[uu]) +
              self._cl_mean(ia[pu], ia_cl[pu]))
        return mf + self.reg_weight * reg + self.cl_rate * cl


class TwinSRGNN(nn.Module):
    """reference srgnn.py:53-122 + layers.py SRGNNConv/SRGNNCell:71-114.

    Consumes THIS framework's padded per-session arrays (x (B,L),
    edge_src/edge_dst (B,L) local node ids, n_edges, alias_inputs,
    item_seq_len); builds the same disjoint-union edge list the
    reference's SessionGraph transform produces, then mean-aggregated
    dual convs + GRU gate."""

    def __init__(self, n_items, cfg):
        super().__init__()
        self.n_items = n_items
        d = int(cfg["embedding_size"])
        self.d = d
        self.step = int(cfg["step"])
        self.item_embedding = nn.Embedding(n_items, d, padding_idx=0)
        self.conv_in = nn.Linear(d, d)
        self.conv_out = nn.Linear(d, d)
        self.lin_ih = nn.Linear(2 * d, 3 * d)
        self.lin_hh = nn.Linear(d, 3 * d)
        self.linear_one = nn.Linear(d, d)
        self.linear_two = nn.Linear(d, d)
        self.linear_three = nn.Linear(d, 1, bias=False)
        self.linear_transform = nn.Linear(2 * d, d)
        stdv = 1.0 / np.sqrt(d)  # reference srgnn.py:81-84
        for w in self.parameters():
            w.data.uniform_(-stdv, stdv)

    @staticmethod
    def _mean_aggr(msgs, dst, n_nodes):
        out = torch.zeros(n_nodes, msgs.shape[1])
        cnt = torch.zeros(n_nodes)
        out.index_add_(0, dst, msgs)
        cnt.index_add_(0, dst, torch.ones(len(dst)))
        return out / cnt.clamp(min=1).unsqueeze(1)

    def _cell(self, hidden, src, dst):
        n = hidden.shape[0]
        inp_in = self._mean_aggr(self.conv_in(hidden)[src], dst, n)
        inp_out = self._mean_aggr(self.conv_out(hidden)[dst], src, n)
        gi = self.lin_ih(torch.cat([inp_in, inp_out], -1))
        gh = self.lin_hh(hidden)
        i_r, i_i, i_n = gi.chunk(3, -1)
        h_r, h_i, h_n = gh.chunk(3, -1)
        reset = torch.sigmoid(i_r + h_r)
        gate = torch.sigmoid(i_i + h_i)
        new = torch.tanh(i_n + reset * h_n)
        return (1 - gate) * hidden + gate * new

    def forward_batch(self, batch):
        x = batch["x"]                       # (B, L) node item-ids
        B, L = x.shape
        flat = x.reshape(-1)
        # disjoint-union edges: local ids + row offset, valid only
        ar = torch.arange(L)
        ev = ar.unsqueeze(0) < batch["n_edges"].unsqueeze(1)
        off = (torch.arange(B) * L).unsqueeze(1)
        src = (batch["edge_src"] + off)[ev]
        dst = (batch["edge_dst"] + off)[ev]
        hidden = self.item_embedding(flat)
        for _ in range(self.step):
            hidden = self._cell(hidden, src, dst)
        seq_hidden = hidden.reshape(B, L, self.d).gather(
            1, (batch["alias_inputs"].long()).unsqueeze(-1).expand(-1, -1, self.d))
        lens = batch["item_seq_len"].long()
        mask = (ar.unsqueeze(0) < lens.unsqueeze(1)).float().unsqueeze(-1)
        ht = seq_hidden[torch.arange(B), lens - 1]
        q1 = self.linear_one(ht).unsqueeze(1)
        q2 = self.linear_two(seq_hidden)
        alpha = self.linear_three(torch.sigmoid(q1 + q2))
        a = (alpha * seq_hidden * mask).sum(1)
        return self.linear_transform(torch.cat([a, ht], 1))

    def full_scores(self, batch):
        seq_out = self.forward_batch(batch)
        return seq_out @ self.item_embedding.weight.T

    def loss(self, batch):
        logits = self.full_scores(batch)
        return F.cross_entropy(logits, batch["item_id"].long())


class TwinGCEGNN(nn.Module):
    """reference gcegnn.py:77-232 (hop=1 default) — typed-edge local
    attention (LocalAggregator :28-43), top-sample_num co-occurrence
    global table (:134-156, dict-built exactly like the reference),
    session-aware GlobalAggregator (:46-73), reverse-position fusion
    (:158-172); CE loss.  Consumes this framework's GCEGNNDataset
    arrays (sessions already reversed; edge attrs 0..3)."""

    def __init__(self, n_items, cfg, train_seqs, train_targets, max_len):
        super().__init__()
        self.n_items = n_items
        d = int(cfg["embedding_size"])
        self.d = d
        self.alpha = float(cfg["leakyrelu_alpha"])
        self.dropout_local = float(cfg["dropout_local"])
        self.dropout_global = float(cfg["dropout_global"])
        self.dropout_gcn = float(cfg["dropout_gcn"])
        self.sample_num = int(cfg["sample_num"])
        self.hop = int(cfg["hop"])
        assert self.hop == 1, "twin covers the default hop=1"
        self.max_len = max_len

        self.item_embedding = nn.Embedding(n_items, d, padding_idx=0)
        self.pos_embedding = nn.Embedding(max_len, d)
        self.edge_emb = nn.Embedding(4, d)
        self.agg_w1 = nn.Parameter(torch.empty(d + 1, d))
        self.agg_w2 = nn.Parameter(torch.empty(d, 1))
        self.agg_w3 = nn.Parameter(torch.empty(2 * d, d))
        self.agg_bias = nn.Parameter(torch.empty(d))
        self.w_1 = nn.Linear(2 * d, d, bias=False)
        self.w_2 = nn.Linear(d, 1, bias=False)
        self.glu1 = nn.Linear(d, d)
        self.glu2 = nn.Linear(d, d, bias=False)
        stdv = 1.0 / np.sqrt(d)   # reference reset_parameters :125-128
        for w in self.parameters():
            w.data.uniform_(-stdv, stdv)

        adj, wgt = self._global_graph(train_seqs, train_targets)
        self.register_buffer("global_adj", adj)
        self.register_buffer("global_weight", wgt)

    def _global_graph(self, seqs, targets):
        """Dict-based build, verbatim reference semantics (:134-156):
        counts of (target, first-4-of-history) both directions, top
        sample_num by count (ties broken by dict insertion order via
        sorted(reverse=True) on counts only)."""
        S = self.sample_num
        graph = [{} for _ in range(self.n_items)]

        def add(a, b):
            graph[a][b] = graph[a].get(b, 0) + 1

        src4 = seqs[:, :4]
        for i in range(len(targets)):
            t = int(targets[i])
            for s in src4[i]:
                s = int(s)
                if s > 0:
                    add(t, s)
                    add(s, t)
        adj = torch.zeros((self.n_items, S), dtype=torch.long)
        wgt = torch.zeros((self.n_items, S))
        for i in range(self.n_items):
            top = sorted(graph[i].items(), reverse=True,
                         key=lambda kv: kv[1])[:S]
            for j, (nid, c) in enumerate(top):
                adj[i, j] = nid
                wgt[i, j] = c
        return adj, wgt

    def _local(self, h_nodes, batch):
        """Typed-edge softmax attention, add-aggregated per dst."""
        x = batch["x"]
        B, L = x.shape
        flat = h_nodes.reshape(B * L, self.d)
        E = batch["edge_src"].shape[1]   # typed edges: wider than L
        ev = torch.arange(E).unsqueeze(0) < batch["n_edges"].unsqueeze(1)
        off = (torch.arange(B) * L).unsqueeze(1)
        src = (batch["edge_src"].long() + off)[ev]
        dst = (batch["edge_dst"].long() + off)[ev]
        attr = batch["edge_attr"].long()[ev]
        xj, xi = flat[src], flat[dst]
        e = ((xj * xi) * self.edge_emb(attr)).sum(-1)
        e = F.leaky_relu(e, negative_slope=self.alpha)
        # per-dst softmax (PyG softmax(index=dst))
        mx = torch.full((B * L,), -1e30)
        mx.scatter_reduce_(0, dst, e, reduce="amax")
        ex = torch.exp(e - mx[dst])
        den = torch.zeros(B * L).index_add_(0, dst, ex)
        alp = ex / den.clamp(min=1e-16)[dst]
        out = torch.zeros_like(flat)
        out.index_add_(0, dst, alp.unsqueeze(-1) * xj)
        return out.reshape(B, L, self.d)

    def forward_batch(self, batch):
        x = batch["x"]
        B, L = x.shape
        alias = batch["alias_inputs"].long()
        lens = batch["item_seq_len"].long()
        mask = (torch.arange(L).unsqueeze(0) < lens.unsqueeze(1)
                ).float().unsqueeze(-1)
        h = self.item_embedding(x)
        h_local = self._local(h, batch)

        seq_items = x.gather(1, alias)                       # (B, L)
        S = self.sample_num
        nbr = self.global_adj[seq_items.reshape(-1)].view(B, L * S)
        wgt = self.global_weight[seq_items.reshape(-1)].view(B, L, S)
        self_vec = self.item_embedding(seq_items)            # (B, L, D)
        nbr_vec = self.item_embedding(nbr).view(B, L, S, self.d)
        item_emb = self_vec * mask
        sess = item_emb.sum(1) / mask.sum(1)                 # (B, D)
        sess = sess.unsqueeze(1).expand(-1, L, -1)           # (B, L, D)

        a_in = torch.cat([sess.unsqueeze(2).expand(-1, -1, S, -1) * nbr_vec,
                          wgt.unsqueeze(-1)], -1)
        a = F.leaky_relu(a_in @ self.agg_w1, negative_slope=0.2)
        a = (a @ self.agg_w2).squeeze(-1)                    # (B, L, S)
        a = torch.softmax(a, -1).unsqueeze(-1)
        nbr_agg = (a * nbr_vec).sum(-2)                      # (B, L, D)
        out = torch.cat([self_vec, nbr_agg], -1)
        out = F.dropout(out, self.dropout_gcn, training=self.training)
        h_global = torch.relu(out @ self.agg_w3)             # (B, L, D)

        h_local = F.dropout(h_local, self.dropout_local,
                            training=self.training)
        h_global = F.dropout(h_global, self.dropout_global,
                             training=self.training)
        h_local_seq = h_local.gather(
            1, alias.unsqueeze(-1).expand(-1, -1, self.d))
        hidden = h_local_seq + h_global

        # fusion (:158-172)
        pos = self.pos_embedding.weight[:L].unsqueeze(0).expand(B, -1, -1)
        hs = (hidden * mask).sum(-2) / mask.sum(1)
        hs = hs.unsqueeze(-2).expand(-1, L, -1)
        nh = torch.tanh(self.w_1(torch.cat([pos, hidden], -1)))
        nh = torch.sigmoid(self.glu1(nh) + self.glu2(hs))
        beta = self.w_2(nh) * mask
        return (beta * hidden).sum(1)

    def full_scores(self, batch):
        return self.forward_batch(batch) @ self.item_embedding.weight.T

    def loss(self, batch):
        return F.cross_entropy(self.full_scores(batch),
                               batch["item_id"].long())


class TwinSSL4Rec(nn.Module):
    """reference ssl4rec.py:25-163 — DNN two-tower (emb→1024 ReLU→128
    tanh) over ID embeddings, in-batch sampled-softmax rec loss
    (:50-57), item-dropout CL through the item tower (:146-163),
    EmbLoss over the TOWER OUTPUTS, xavier-uniform init."""

    def __init__(self, n_users, n_items, cfg):
        super().__init__()
        emb = int(cfg["embedding_size"])
        self.tau = float(cfg["tau"])
        self.reg_weight = float(cfg["reg_weight"])
        self.cl_rate = float(cfg["ssl_weight"])
        self.require_pow = bool(cfg["require_pow"])
        self.user_emb = nn.Embedding(n_users, emb)
        self.item_emb = nn.Embedding(n_items, emb)
        self.user_tower = nn.Sequential(
            nn.Linear(emb, 1024), nn.ReLU(True),
            nn.Linear(1024, 128), nn.Tanh())
        self.item_tower = nn.Sequential(
            nn.Linear(emb, 1024), nn.ReLU(True),
            nn.Linear(1024, 128), nn.Tanh())
        self.dropout = nn.Dropout(float(cfg["drop_ratio"]))
        xavier_uniform_all(self)

    def _nce(self, x1, x2, eps=0.0):
        """exp-ratio InfoNCE exactly as written in the reference
        (ssl4rec.py:50-57 adds 10e-6 inside the log; :157-163 does not)."""
        x1, x2 = F.normalize(x1, dim=-1), F.normalize(x2, dim=-1)
        pos = torch.exp((x1 * x2).sum(-1) / self.tau)
        ttl = torch.exp(x1 @ x2.T / self.tau).sum(1)
        return -torch.log(pos / ttl + eps).mean()

    def propagate(self):
        return (self.user_tower(self.user_emb.weight),
                self.item_tower(self.item_emb.weight))

    def loss(self, batch):
        u, p = batch["user_id"].long(), batch["item_id"].long()
        ue = self.user_tower(self.user_emb(u))
        ie = self.item_tower(self.item_emb(p))
        rec = self._nce(ue, ie, eps=10e-6)
        base = self.item_emb(p)
        v1 = self.item_tower(self.dropout(base))
        v2 = self.item_tower(self.dropout(base))
        cl = self._nce(v1, v2)
        reg = emb_loss([ue, ie], len(u), require_pow=self.require_pow)
        return rec + self.cl_rate * cl + self.reg_weight * reg
