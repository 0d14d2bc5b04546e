"""Value-level parity goldens against torch (installed, CPU) and
independent numpy references — VERDICT r1 #6: every family's
distinctive loss / conv gets a numeric test, not just "doesn't crash".

torch here plays the role of the reference stack's substrate: the
recbole layers the reference imports (GRU, TransformerEncoder layout,
BPR-family reductions, pdist) are reproduced with torch ops and
compared value-for-value against this repo's JAX implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def _np(x):
    return np.asarray(x)


# -- GRU vs torch.nn.GRU (GRU4Rec / NARM / LESSR mailbox) ---------------

def test_gru_scan_matches_torch_gru():
    from recbole_gnn_tpu.models.layers import gru_params, gru_scan

    rng = np.random.default_rng(0)
    B, T, D, H = 4, 7, 6, 6
    p = gru_params(jax.random.PRNGKey(0), D, H)
    xs = rng.normal(size=(B, T, D)).astype(np.float32)

    states, last = gru_scan(p, jnp.asarray(xs), jnp.zeros((B, H)))

    g = torch.nn.GRU(D, H, batch_first=True)
    with torch.no_grad():
        g.weight_ih_l0.copy_(torch.tensor(_np(p["ih"]["w"]).T))
        g.bias_ih_l0.copy_(torch.tensor(_np(p["ih"]["b"])))
        g.weight_hh_l0.copy_(torch.tensor(_np(p["hh"]["w"]).T))
        g.bias_hh_l0.copy_(torch.tensor(_np(p["hh"]["b"])))
    out, hN = g(torch.tensor(xs))
    np.testing.assert_allclose(_np(states), out.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(_np(last), hN[0].detach().numpy(),
                               rtol=1e-5, atol=1e-6)


# -- Transformer encoder vs torch replication of [recbole] layout -------

def test_transformer_encoder_matches_torch_reference():
    """Post-LN block with exact-erf gelu, eps=1e-12 LayerNorm — the
    [recbole] TransformerEncoder layout GCSAN imports (gcsan.py:59-68),
    re-implemented with torch ops."""
    from recbole_gnn_tpu.models.layers import (
        causal_additive_mask, transformer_encoder, transformer_params)

    rng = np.random.default_rng(1)
    B, T, D, heads, ff = 3, 5, 8, 2, 16
    p = transformer_params(jax.random.PRNGKey(1), n_layers=2,
                           n_heads=heads, d_model=D, d_ff=ff)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    valid = np.ones((B, T), bool)
    valid[1, 3:] = False
    mask = causal_additive_mask(jnp.asarray(valid))
    out = transformer_encoder(p, jnp.asarray(x), mask, n_heads=heads)

    def tlin(lp, h):
        return h @ t(lp["w"]) + t(lp["b"])

    def tln(lp, h):
        mu = h.mean(-1, keepdim=True)
        var = h.var(-1, unbiased=False, keepdim=True)
        return (h - mu) / torch.sqrt(var + 1e-12) * t(lp["g"]) + t(lp["b"])

    h = t(x)
    am = t(mask)
    dh = D // heads
    for lp in p["layers"]:
        q = tlin(lp["q"], h).reshape(B, T, heads, dh).permute(0, 2, 1, 3)
        k = tlin(lp["k"], h).reshape(B, T, heads, dh).permute(0, 2, 1, 3)
        v = tlin(lp["v"], h).reshape(B, T, heads, dh).permute(0, 2, 1, 3)
        scores = q @ k.transpose(-1, -2) / np.sqrt(dh) + am[:, None]
        attn = torch.softmax(scores, dim=-1)
        ctx = (attn @ v).permute(0, 2, 1, 3).reshape(B, T, D)
        h = tln(lp["ln1"], h + tlin(lp["o"], ctx))
        ffh = tlin(lp["ff2"], torch.nn.functional.gelu(tlin(lp["ff1"], h)))
        h = tln(lp["ln2"], h + ffh)
    np.testing.assert_allclose(_np(out), h.numpy(), rtol=1e-4, atol=1e-5)


# -- NGCF BiGNN conv ----------------------------------------------------

def test_bignn_conv_matches_numpy():
    """(L+I)·E·W₁ + (L·E ⊙ E)·W₂ (reference BiGNNConv layers.py:41-66)."""
    from recbole_gnn_tpu.models.layers import bignn_conv, bignn_params
    from recbole_gnn_tpu.ops.spmm import build_graph

    rng = np.random.default_rng(2)
    n, e, d = 30, 150, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    g = build_graph(src, dst, w, n)
    p = bignn_params(jax.random.PRNGKey(2), d, d)
    x = rng.normal(size=(n, d)).astype(np.float32)
    out = bignn_conv(p, g, jnp.asarray(x))

    L = np.zeros((n, n))
    for s, d_, ww in zip(src, dst, w):
        L[d_, s] += ww
    xp = L @ x
    want = ((xp + x) @ _np(p["lin1"]["w"]) + _np(p["lin1"]["b"]) +
            (xp * x) @ _np(p["lin2"]["w"]) + _np(p["lin2"]["b"]))
    np.testing.assert_allclose(_np(out), want, rtol=1e-4, atol=1e-4)


# -- InfoNCE reductions (SGL / SimGCL / XSimGCL / NCL) -------------------

def _torch_info_nce(v1, v2, tau, all_v2=None, reduction="sum"):
    v1 = torch.nn.functional.normalize(t(v1), dim=-1)
    v2 = torch.nn.functional.normalize(t(v2), dim=-1)
    av2 = v2 if all_v2 is None else \
        torch.nn.functional.normalize(t(all_v2), dim=-1)
    pos = (v1 * v2).sum(-1) / tau
    ttl = torch.logsumexp(v1 @ av2.T / tau, dim=-1)
    loss = ttl - pos
    return loss.sum() if reduction == "sum" else loss.mean()


def test_info_nce_sum_and_mean_match_torch():
    from recbole_gnn_tpu.models.losses import info_nce

    rng = np.random.default_rng(3)
    B, D, N = 16, 8, 40
    v1 = rng.normal(size=(B, D)).astype(np.float32)
    v2 = rng.normal(size=(B, D)).astype(np.float32)
    allv = rng.normal(size=(N, D)).astype(np.float32)
    # SGL/SimGCL sum-reduction against a larger negative pool
    got = float(info_nce(jnp.asarray(v1), jnp.asarray(v2), 0.2,
                         all_view2=jnp.asarray(allv), reduction="sum"))
    want = float(_torch_info_nce(v1, v2, 0.2, allv, "sum"))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # XSimGCL mean-reduction
    got_m = float(info_nce(jnp.asarray(v1), jnp.asarray(v2), 0.2,
                           reduction="mean"))
    want_m = float(_torch_info_nce(v1, v2, 0.2, None, "mean"))
    np.testing.assert_allclose(got_m, want_m, rtol=1e-4)


def test_cl_nce_masked_matches_torch_on_valid_rows():
    """The static-shape unique-batch CL (fill rows excluded from
    numerator AND denominator) must equal torch InfoNCE computed on
    only the valid rows."""
    from recbole_gnn_tpu.models.losses import cl_nce_masked

    rng = np.random.default_rng(4)
    B, D, n_valid = 12, 8, 9
    v1 = rng.normal(size=(B, D)).astype(np.float32)
    v2 = rng.normal(size=(B, D)).astype(np.float32)
    mask = np.zeros(B, bool)
    mask[:n_valid] = True
    got = float(cl_nce_masked(jnp.asarray(v1), jnp.asarray(v2), 0.5,
                              jnp.asarray(mask), reduction="sum"))
    want = float(_torch_info_nce(v1[:n_valid], v2[:n_valid], 0.5,
                                 None, "sum"))
    np.testing.assert_allclose(got, want, rtol=1e-4)


# -- SSL4REC in-batch sampled softmax -----------------------------------

def test_batch_softmax_loss_matches_torch():
    from recbole_gnn_tpu.models.losses import batch_softmax_loss

    rng = np.random.default_rng(5)
    B, D = 10, 8
    u = rng.normal(size=(B, D)).astype(np.float32)
    i = rng.normal(size=(B, D)).astype(np.float32)
    got = float(batch_softmax_loss(jnp.asarray(u), jnp.asarray(i), 0.1))
    un = torch.nn.functional.normalize(t(u), dim=-1)
    inn = torch.nn.functional.normalize(t(i), dim=-1)
    logits = un @ inn.T / 0.1
    want = float(torch.nn.functional.cross_entropy(
        logits, torch.arange(B)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


# -- DirectAU uniformity vs torch.pdist ----------------------------------

def test_directau_uniformity_matches_torch_pdist():
    from recbole_gnn_tpu.models.losses import uniformity_loss

    rng = np.random.default_rng(6)
    x = rng.normal(size=(20, 8)).astype(np.float32)
    got = float(uniformity_loss(jnp.asarray(x)))
    want = float(torch.pdist(t(x), p=2).pow(2).mul(-2).exp().mean().log())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_directau_alignment_matches_torch():
    from recbole_gnn_tpu.models.losses import alignment_loss

    rng = np.random.default_rng(7)
    x = rng.normal(size=(20, 8)).astype(np.float32)
    y = rng.normal(size=(20, 8)).astype(np.float32)
    got = float(alignment_loss(jnp.asarray(x), jnp.asarray(y)))
    want = float((t(x) - t(y)).norm(p=2, dim=1).pow(2).mean())
    np.testing.assert_allclose(got, want, rtol=1e-4)


# -- LESSR EOPA vs direct ordered torch-GRU ------------------------------

def test_lessr_eopa_matches_torch_ordered_gru():
    """The scan-based edge-order-preserving aggregation must equal, per
    node, a torch GRU run over that node's time-ordered in-edge
    messages (reference lessr.py:36-43 DGL update_all with GRU
    reducer)."""
    from conftest import base_config_dict
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation

    cfg = Config(config_dict=base_config_dict(
        model="LESSR", batch_norm=False, feat_drop=0.0))
    ds = create_dataset(cfg)
    (tl, tr_ds), _, _ = data_preparation(cfg, ds)
    model = get_model("LESSR")(cfg, tr_ds)
    params = model.init_params(jax.random.PRNGKey(3))
    batch = next(iter(tl))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    B, L = batch["x"].shape
    D = model.embedding_size
    feat = params["item_emb"][batch["x"]]
    nmask = jnp.arange(L)[None, :] < batch["n_nodes"][:, None]
    lp = params["layers"][0]
    _, out = model._eopa(lp, feat, batch, nmask, jax.random.PRNGKey(0),
                         train=False)

    # torch reference: per (b, node), ordered mailbox GRU
    g = torch.nn.GRU(D, D, batch_first=True)
    with torch.no_grad():
        g.weight_ih_l0.copy_(torch.tensor(_np(lp["gru"]["ih"]["w"]).T))
        g.bias_ih_l0.copy_(torch.tensor(_np(lp["gru"]["ih"]["b"])))
        g.weight_hh_l0.copy_(torch.tensor(_np(lp["gru"]["hh"]["w"]).T))
        g.bias_hh_l0.copy_(torch.tensor(_np(lp["gru"]["hh"]["b"])))
    feat_np = _np(feat)
    neigh = np.zeros((B, L, D), np.float32)
    for b in range(B):
        ne = int(batch["n_eop"][b])
        src = _np(batch["eop_src"][b][:ne])
        dst = _np(batch["eop_dst"][b][:ne])
        for node in range(int(batch["n_nodes"][b])):
            msgs = [feat_np[b, s] for s, d_ in zip(src, dst) if d_ == node]
            if not msgs:
                continue
            seq = torch.tensor(np.stack(msgs)[None], dtype=torch.float32)
            _, hN = g(seq)
            neigh[b, node] = hN[0, 0].detach().numpy()

    w_self = _np(lp["fc_self"]["w"])
    w_neigh = _np(lp["fc_neigh"]["w"])
    pre = feat_np @ w_self + neigh @ w_neigh
    alpha = _np(lp["prelu"])
    want = np.where(pre > 0, pre, alpha * pre)
    np.testing.assert_allclose(_np(out), want, rtol=2e-3, atol=2e-4)


# -- GCE-GNN joint (j, t) softmax ----------------------------------------

def test_gcegnn_local_agg_joint_softmax_matches_numpy():
    """Typed-edge attention normalizes over ALL (neighbor, type)
    incident pairs jointly (reference LocalAggregator :28-43 — PyG
    softmax over the stacked typed edge list)."""
    from conftest import base_config_dict
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation

    cfg = Config(config_dict=base_config_dict(model="GCEGNN"))
    ds = create_dataset(cfg)
    (tl, tr_ds), _, _ = data_preparation(cfg, ds)
    model = get_model("GCEGNN")(cfg, tr_ds)
    params = model.init_params(jax.random.PRNGKey(4))
    batch = {k: jnp.asarray(v) for k, v in next(iter(tl)).items()}
    h = params["item_emb"][batch["x"]]
    out = model._local_agg(params, h, batch)

    b = 0
    L = h.shape[1]
    D = h.shape[2]
    hb = _np(h[b]).astype(np.float64)
    ne = int(batch["n_edges"][b])
    src = _np(batch["edge_src"][b][:ne])
    dst = _np(batch["edge_dst"][b][:ne])
    attr = _np(batch["edge_attr"][b][:ne])
    a = float(model.leakyrelu_alpha)
    logits = {}
    for s, d_, at in zip(src, dst, attr):
        e = np.dot(hb[d_] * _np(params["edge_emb"][at]), hb[s])
        e = e if e > 0 else a * e
        logits[(d_, s, at)] = e
    wmat = np.zeros((L, L))
    for i in range(L):
        inc = [(key, v) for key, v in logits.items() if key[0] == i]
        if not inc:
            continue
        mx = max(v for _, v in inc)
        z = sum(np.exp(v - mx) for _, v in inc)
        for (d_, s, at), v in inc:
            wmat[i, s] += np.exp(v - mx) / z
    want_b = wmat @ hb    # Σ_(j,t) α·h_j — add-aggregation, no h_i gate
    np.testing.assert_allclose(_np(out[b]), want_b, rtol=2e-3, atol=2e-4)


# -- MHCN channel attention ----------------------------------------------

def test_srgnn_cell_dense_matches_torch():
    """srgnn_cell_dense vs a torch replication of the reference
    SRGNNCell (layers.py:82-114): dual mean-aggregation linear convs
    (in/out directions) + GRU-style gate.  The dense (B, L, L)
    row-normalized adjacency realizes PyG's aggr='mean' propagate."""
    from recbole_gnn_tpu.models.layers import srgnn_cell_params
    from recbole_gnn_tpu.models.sequential.common import srgnn_cell_dense

    rng = np.random.default_rng(21)
    B, L, D = 3, 6, 8
    p = srgnn_cell_params(jax.random.PRNGKey(4), D)
    hidden = rng.normal(size=(B, L, D)).astype(np.float32)
    # random deduped session edges; A_in[b, i, j] = 1/in_deg(i)
    a = (rng.random((B, L, L)) < 0.3).astype(np.float32)
    a_in = a / np.maximum(a.sum(-1, keepdims=True), 1.0)
    at = np.swapaxes(a, 1, 2)
    a_out = at / np.maximum(at.sum(-1, keepdims=True), 1.0)

    out = srgnn_cell_dense(p, jnp.asarray(hidden), jnp.asarray(a_in),
                           jnp.asarray(a_out))

    h = t(hidden)
    lin = lambda q, x: x @ t(_np(q["w"])) + t(_np(q["b"]))
    input_in = t(a_in) @ lin(p["in_conv"], h)
    input_out = t(a_out) @ lin(p["out_conv"], h)
    gi = lin(p["lin_ih"], torch.cat([input_in, input_out], dim=-1))
    gh = lin(p["lin_hh"], h)
    i_r, i_i, i_n = gi.chunk(3, -1)
    h_r, h_i, h_n = gh.chunk(3, -1)
    reset = torch.sigmoid(i_r + h_r)
    update = torch.sigmoid(i_i + h_i)
    new = torch.tanh(i_n + reset * h_n)
    want = (1 - update) * h + update * new
    np.testing.assert_allclose(_np(out), want.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_sgnnhn_star_blend_matches_torch():
    """star_blend_step vs a torch replication of reference
    sgnnhn.py:93-100 + att_out:79-86: sigmoid blend toward the star
    node, then softmax-attention star refresh (full sessions — the
    per-session softmax is over all L nodes, matching PyG softmax over
    the batch vector when no padding exists)."""
    from recbole_gnn_tpu.models.sequential.sgnnhn import star_blend_step

    rng = np.random.default_rng(22)
    B, L, D = 4, 5, 8
    hidden = rng.normal(size=(B, L, D)).astype(np.float32)
    star = rng.normal(size=(B, D)).astype(np.float32)
    smask = np.ones((B, L), np.float32)

    h_out, s_out = star_blend_step(jnp.asarray(hidden), jnp.asarray(star),
                                   jnp.asarray(smask), D)

    h, s = t(hidden), t(star)
    sim = (h * s[:, None, :]).sum(-1, keepdim=True) / np.sqrt(D)
    alpha = torch.sigmoid(sim)
    h2 = (1 - alpha) * h + alpha * s[:, None, :]
    att = torch.softmax((h2 * s[:, None, :]).sum(-1), dim=1)
    s2 = (att.unsqueeze(-1) * h2).sum(1)
    np.testing.assert_allclose(_np(h_out), h2.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(_np(s_out), s2.numpy(), rtol=1e-5,
                               atol=1e-6)


def _bare_ncl(n_users, n_items, ssl_temp=0.1, ssl_reg=1e-3, alpha=0.7,
              proto_reg=1e-2):
    from recbole_gnn_tpu.models.general.ncl import NCL
    m = object.__new__(NCL)
    m.n_users, m.n_items = n_users, n_items
    m.ssl_temp, m.ssl_reg, m.alpha, m.proto_reg = (
        ssl_temp, ssl_reg, alpha, proto_reg)
    return m


def test_ncl_ssl_layer_loss_matches_torch():
    """NCL structure-contrastive loss vs a torch replication of
    reference ncl.py:135-164 (normalize current/previous views,
    in-view softmax over ALL previous embeddings, sum-reduced,
    ssl_reg·(user + alpha·item))."""
    rng = np.random.default_rng(23)
    n_u, n_i, D, B = 7, 9, 6, 5
    m = _bare_ncl(n_u, n_i)
    current = rng.normal(size=(n_u + n_i, D)).astype(np.float32)
    previous = rng.normal(size=(n_u + n_i, D)).astype(np.float32)
    user = rng.integers(0, n_u, B)
    item = rng.integers(0, n_i, B)

    got = float(m._ssl_layer_loss(jnp.asarray(current),
                                  jnp.asarray(previous),
                                  jnp.asarray(user), jnp.asarray(item),
                                  None))

    def side(cur_all, prev_all, idx):
        e1 = torch.nn.functional.normalize(cur_all[idx])
        e2 = torch.nn.functional.normalize(prev_all[idx])
        all2 = torch.nn.functional.normalize(prev_all)
        pos = torch.exp((e1 * e2).sum(1) / m.ssl_temp)
        ttl = torch.exp(e1 @ all2.T / m.ssl_temp).sum(1)
        return -torch.log(pos / ttl).sum()

    cu, ci = t(current[:n_u]), t(current[n_u:])
    pu, pi = t(previous[:n_u]), t(previous[n_u:])
    want = m.ssl_reg * (side(cu, pu, torch.tensor(user))
                        + m.alpha * side(ci, pi, torch.tensor(item)))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_ncl_proto_nce_matches_torch():
    """NCL prototype-contrastive loss vs a torch replication of
    reference ncl.py:106-133 (normalized embeddings vs k-means
    centroids; centroids enter pre-normalized, as the e-step stores
    them)."""
    rng = np.random.default_rng(24)
    n_u, n_i, D, B, K = 6, 8, 5, 4, 3
    m = _bare_ncl(n_u, n_i)
    center = rng.normal(size=(n_u + n_i, D)).astype(np.float32)

    def unit(a):
        return (a / np.linalg.norm(a, axis=1, keepdims=True)).astype(
            np.float32)

    extras = {
        "user_centroids": jnp.asarray(unit(rng.normal(size=(K, D)))),
        "user_2cluster": jnp.asarray(rng.integers(0, K, n_u), jnp.int32),
        "item_centroids": jnp.asarray(unit(rng.normal(size=(K, D)))),
        "item_2cluster": jnp.asarray(rng.integers(0, K, n_i), jnp.int32),
    }
    user = rng.integers(0, n_u, B)
    item = rng.integers(0, n_i, B)

    got = float(m._proto_nce(jnp.asarray(center), extras,
                             jnp.asarray(user), jnp.asarray(item), None))

    def side(emb_all, idx, cents, assign):
        e = torch.nn.functional.normalize(emb_all[idx])
        c = cents[assign[idx]]
        pos = torch.exp((e * c).sum(1) / m.ssl_temp)
        ttl = torch.exp(e @ cents.T / m.ssl_temp).sum(1)
        return -torch.log(pos / ttl).sum()

    want = m.proto_reg * (
        side(t(center[:n_u]), torch.tensor(user),
             t(_np(extras["user_centroids"])),
             torch.tensor(_np(extras["user_2cluster"])))
        + side(t(center[n_u:]), torch.tensor(item),
               t(_np(extras["item_centroids"])),
               torch.tensor(_np(extras["item_2cluster"]))))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


def test_hmlet_gating_eval_hard_one_hot_matches_numpy():
    """HMLET gating EVAL path vs a numpy replication of the reference
    Gating_Net hard gumbel-softmax (hmlet.py:27-84): in eval the gate
    emits an exact one-hot at argmax of softmax((logits+g)/τ), with the
    straight-through estimator leaving the forward VALUE hard.  The
    gumbel draw is reproduced from the same PRNG key sequence."""
    from recbole_gnn_tpu.models.general.hmlet import HMLET
    from recbole_gnn_tpu.models.init import linear_params

    rng = np.random.default_rng(25)
    N, D = 12, 6
    m = object.__new__(HMLET)
    m.dropout_ratio = 0.0
    gate = [{"lin": linear_params(jax.random.PRNGKey(7), D, 2)}]
    feat = rng.normal(size=(N, D)).astype(np.float32)
    temp = 0.7
    key = jax.random.PRNGKey(9)

    y = _np(m._gating(gate, jnp.asarray(feat), temp, key, train=False))

    # replicate: no bn layer → loop does no split; one split for gumbel
    _, k = jax.random.split(key)
    u = _np(jax.random.uniform(k, (N, 2)))
    g = -np.log(-np.log(u + 1e-20) + 1e-20)
    logits = feat @ _np(gate[0]["lin"]["w"]) + _np(gate[0]["lin"]["b"])
    soft = (logits + g) / temp
    hard = (soft == soft.max(axis=-1, keepdims=True)).astype(np.float32)
    assert ((y == 0.0) | (y == 1.0)).all()          # exact one-hot
    np.testing.assert_array_equal(y.sum(axis=1), np.ones(N))
    np.testing.assert_array_equal(y, hard)


def test_xsimgcl_unique_batch_cl_matches_torch():
    """XSimGCL's CL term contrasts the UNIQUE batch ids against each
    other (reference xsimgcl.py:56,50-56: torch.unique then
    mean-reduced NCE over that set).  Our static-shape path
    (masked_unique + cl_nce_masked with weight-0 padding) must equal
    the torch reference on a batch WITH duplicates."""
    from recbole_gnn_tpu.models.losses import cl_nce_masked, masked_unique

    rng = np.random.default_rng(26)
    N, D, B = 15, 6, 12
    x1_all = rng.normal(size=(N, D)).astype(np.float32)
    x2_all = rng.normal(size=(N, D)).astype(np.float32)
    ids = rng.integers(1, N, B)   # id 0 is PAD, never in a real batch
    ids[3] = ids[0]
    ids[7] = ids[1]          # force duplicates

    uu, mask = masked_unique(jnp.asarray(ids))
    got = float(cl_nce_masked(jnp.asarray(x1_all)[uu],
                              jnp.asarray(x2_all)[uu], 0.2, mask, "mean"))

    uniq = torch.unique(torch.tensor(ids))
    x1 = torch.nn.functional.normalize(t(x1_all)[uniq])
    x2 = torch.nn.functional.normalize(t(x2_all)[uniq])
    pos = torch.exp((x1 * x2).sum(-1) / 0.2)
    ttl = torch.exp(x1 @ x2.T / 0.2).sum(1)
    want = float((-torch.log(pos / ttl)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mhcn_mim_matches_torch():
    """MHCN hierarchical mutual-information loss vs a torch replication
    of reference mhcn.py:217-241 (self-gated users, hypergraph-conv
    edge embeddings, row / row-column shuffles, local + global MIM) —
    with the SAME permutations injected (reproduced from the jax PRNG
    sequence _mim draws)."""
    from recbole_gnn_tpu.models.social.mhcn import MHCN
    from recbole_gnn_tpu.models.init import linear_params

    rng_np = np.random.default_rng(27)
    N, D = 10, 6
    m = object.__new__(MHCN)
    user_all = jnp.asarray(rng_np.normal(size=(N, D)), jnp.float32)
    H = jnp.asarray(rng_np.normal(size=(N, N)), jnp.float32)
    params = {"g": {"lin": linear_params(jax.random.PRNGKey(11), D, D)}}
    key = jax.random.PRNGKey(12)

    got = float(m._mim(params, {"H": H}, user_all, "H", "g", key))

    # torch replication with the same permutation draws
    k1, k2, k3 = jax.random.split(key, 3)
    pr = np.asarray(jax.random.permutation(k1, N))
    pr2 = np.asarray(jax.random.permutation(k2, N))
    pc = np.asarray(jax.random.permutation(k3, D))
    u = t(_np(user_all))
    W = t(_np(params["g"]["lin"]["w"]))
    b = t(_np(params["g"]["lin"]["b"]))
    emb = u * torch.sigmoid(u @ W + b)
    edge = t(_np(H)) @ emb
    score = lambda a, b_: (a * b_).sum(1)
    rc = edge[:, torch.tensor(pc)][torch.tensor(pr2)]
    pos = score(emb, edge)
    neg1 = score(emb[torch.tensor(pr)], edge)
    neg2 = score(rc, emb)
    sig = torch.nn.functional.logsigmoid
    local = (-sig(pos - neg1) - sig(neg1 - neg2)).sum()
    graph = edge.mean(0, keepdim=True)
    glob = (-sig(score(edge, graph) - score(rc, graph))).sum()
    np.testing.assert_allclose(got, float(local + glob), rtol=1e-4)


def test_mhcn_channel_attention_matches_numpy():
    from conftest import base_config_dict
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation

    cfg = Config(config_dict=base_config_dict(model="MHCN"))
    ds = create_dataset(cfg)
    (_, tr_ds), _, _ = data_preparation(cfg, ds)
    model = get_model("MHCN")(cfg, tr_ds)
    params = model.init_params(jax.random.PRNGKey(5))
    rng = np.random.default_rng(8)
    n, d = 17, model.embedding_size
    e1, e2, e3 = (rng.normal(size=(n, d)).astype(np.float32)
                  for _ in range(3))
    out = model._attention(params, jnp.asarray(e1), jnp.asarray(e2),
                           jnp.asarray(e3))

    am = _np(params["att_mat"]).astype(np.float64)
    av = _np(params["att_vec"]).astype(np.float64)
    ws = np.stack([(av * (e @ am)).sum(1) for e in (e1, e2, e3)])
    ws = np.exp(ws - ws.max(0)) / np.exp(ws - ws.max(0)).sum(0)
    want = sum(w[:, None] * e for w, e in zip(ws, (e1, e2, e3)))
    np.testing.assert_allclose(_np(out), want, rtol=1e-4, atol=1e-5)
