"""Data pipeline unit tests: atomic reading, filtering, remap, splits,
augmentation, session graphs, social net, sampler — determinism and
invariants the reference never tested (SURVEY.md §4)."""

import numpy as np
import pytest

from recbole_gnn_tpu.config import Config
from recbole_gnn_tpu.data.dataset import (
    Dataset, GeneralGraphDataset, parse_interval)
from recbole_gnn_tpu.data.session import SessionGraphDataset, LESSRDataset
from recbole_gnn_tpu.data.social import SocialDataset
from recbole_gnn_tpu.data.sampler import UniformNegativeSampler

from conftest import base_config_dict


def make_config(model="LightGCN", **over):
    return Config(config_dict=base_config_dict(model=model, **over))


def test_parse_interval():
    assert parse_interval("[3,inf)") == (3.0, np.inf, True, False)
    assert parse_interval("(0,5]") == (0.0, 5.0, False, True)


def test_dataset_loads_and_remaps():
    ds = GeneralGraphDataset(make_config())
    assert ds.inter_num > 5000
    users = ds.inter[ds.uid_field]
    items = ds.inter[ds.iid_field]
    assert users.min() >= 1 and items.min() >= 1      # 0 = PAD
    assert users.max() == ds.n_users - 1
    assert items.max() == ds.n_items - 1
    assert ds.field2id_token[ds.uid_field][0] == "[PAD]"


def test_rating_filter():
    ds_all = GeneralGraphDataset(make_config())
    ds_f = GeneralGraphDataset(make_config(val_interval={"rating": "[3,inf)"}))
    assert ds_f.inter_num < ds_all.inter_num
    assert (ds_f.inter["rating"] >= 3).all()


def test_kcore_filter():
    cfg = make_config(user_inter_num_interval="[5,inf)",
                      item_inter_num_interval="[5,inf)")
    ds = GeneralGraphDataset(cfg)
    u, c = np.unique(ds.inter[ds.uid_field], return_counts=True)
    assert c.min() >= 5
    i, ci = np.unique(ds.inter[ds.iid_field], return_counts=True)
    assert ci.min() >= 5


def test_ratio_split_grouped_conservation():
    ds = GeneralGraphDataset(make_config())
    tr, va, te = ds.build()
    assert tr.inter_num + va.inter_num + te.inter_num == ds.inter_num
    # grouped 8:1:1: every user's counts split per _calc_split_counts
    assert tr.inter_num > 0.7 * ds.inter_num
    assert va.inter_num > 0 and te.inter_num > 0


def test_split_deterministic():
    a = GeneralGraphDataset(make_config()).build()
    b = GeneralGraphDataset(make_config()).build()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.inter[x.uid_field],
                                      y.inter[y.uid_field])
        np.testing.assert_array_equal(x.inter[x.iid_field],
                                      y.inter[y.iid_field])


def test_calc_split_counts():
    # [recbole] semantics: floor + remainder to first, fractional grants
    assert Dataset._calc_split_counts(10, [0.8, 0.1, 0.1]) == [8, 1, 1]
    assert Dataset._calc_split_counts(5, [0.8, 0.1, 0.1]) == [3, 1, 1]
    assert Dataset._calc_split_counts(1, [0.8, 0.1, 0.1]) == [1, 0, 0]


def test_norm_adj_symmetric_weights():
    ds = GeneralGraphDataset(make_config())
    g = ds.get_norm_adj_graph(force_sparse=True)
    n = ds.n_users + ds.n_items
    assert g.n_nodes == n
    assert g.n_edges == 2 * ds.inter_num   # real edges (nnz)
    # dst-sorted
    dst = np.asarray(g.dst)
    assert (np.diff(dst) >= 0).all()
    # real edges carry positive normalized weights; pallas pad edges
    # (appended at the end) are zero-weight
    w = np.asarray(g.weight)
    assert (w[:g.n_edges] > 0).all()
    assert (w[g.n_edges:] == 0).all()


def test_norm_adj_dense_matches_sparse():
    ds = GeneralGraphDataset(make_config())
    gs = ds.get_norm_adj_graph(force_sparse=True)
    gd = ds.get_norm_adj_graph()
    from recbole_gnn_tpu.ops.spmm import BipartiteDenseGraph, spmm_any
    assert isinstance(gd, BipartiteDenseGraph)
    assert gd.n_edges == gs.n_edges == 2 * ds.inter_num
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(gs.n_nodes, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(spmm_any(gd, x)),
                               np.asarray(spmm_any(gs, x)),
                               rtol=2e-4, atol=2e-4)


def test_sequential_augmentation():
    cfg = make_config(model="SRGNN")
    ds = SessionGraphDataset(cfg)
    ds.data_augmentation()
    L = ds.max_seq_len
    seqs = ds.inter[ds.item_list_field]
    lens = ds.inter[ds.item_length_field]
    tgt = ds.inter[ds.iid_field]
    assert seqs.shape[1] == L
    assert (lens >= 1).all() and (lens <= L).all()
    assert (tgt >= 1).all()
    # padding beyond length is 0
    pos = np.arange(L)[None, :]
    assert (np.where(pos >= lens[:, None], seqs, 0) == 0).all()
    # augmented samples per user = n_u - 1 (when n_u <= L+1)
    uids_orig = GeneralGraphDataset(make_config()).inter["user_id"]
    _, cnt = np.unique(uids_orig, return_counts=True)
    assert ds.inter_num == (cnt - 1).sum()


def test_session_graph_construction():
    cfg = make_config(model="SRGNN")
    ds = SessionGraphDataset(cfg)
    tr, va, te = ds.build()
    g = tr.session_graphs
    seqs = tr.inter[tr.item_list_field]
    lens = tr.inter[tr.item_length_field]
    r = 3  # spot-check a row
    seq = seqs[r, :lens[r]]
    want_nodes = np.unique(seq)
    assert g["n_nodes"][r] == len(want_nodes)
    np.testing.assert_array_equal(g["x"][r, :len(want_nodes)], want_nodes)
    # alias maps positions back to their item
    alias = g["alias_inputs"][r]
    np.testing.assert_array_equal(g["x"][r][alias[:lens[r]]], seq)
    # edges: deduped consecutive pairs in local indices
    ne = g["n_edges"][r]
    pairs = {(int(a), int(b)) for a, b in
             zip(g["edge_src"][r, :ne], g["edge_dst"][r, :ne])}
    want = set()
    inv = {v: i for i, v in enumerate(want_nodes)}
    for a, b in zip(seq[:-1], seq[1:]):
        want.add((inv[a], inv[b]))
    assert pairs == want


def test_leave_one_out_split():
    cfg = make_config(model="SRGNN")
    ds = SessionGraphDataset(cfg)
    tr, va, te = ds.build()
    assert tr.inter_num + va.inter_num + te.inter_num == ds.inter_num
    # each user contributes exactly 1 valid + 1 test sample (users with
    # >= 3 augmented samples; all fixture users qualify)
    uids = ds.inter[ds.uid_field]
    n_users_with = len(np.unique(uids))
    assert va.inter_num == n_users_with
    assert te.inter_num == n_users_with


def test_lessr_graphs():
    cfg = make_config(model="LESSR")
    ds = LESSRDataset(cfg)
    tr, _, _ = ds.build()
    g = tr.session_graphs
    lens = tr.inter[tr.item_length_field]
    r = int(np.argmax(lens))  # longest session
    # EOP edges = len-1, in order, not deduped
    assert g["n_eop"][r] == lens[r] - 1
    alias = g["alias_inputs"][r]
    np.testing.assert_array_equal(g["eop_src"][r, :lens[r] - 1],
                                  alias[:lens[r] - 1])
    np.testing.assert_array_equal(g["eop_dst"][r, :lens[r] - 1],
                                  alias[1:lens[r]])
    # exactly one is_last node
    assert g["is_last"][r].sum() == 1
    # shortcut edges include all i<j pairs deduped
    n_cut = g["n_cut"][r]
    assert n_cut >= lens[r] - 1


def test_social_dataset_joint_remap():
    cfg = Config(config_dict=base_config_dict(
        model="DiffNet",
        load_col={"inter": ["user_id", "item_id", "rating", "timestamp"],
                  "net": ["source_id", "target_id"]}))
    ds = SocialDataset(cfg)
    src, dst = ds.net_edges()
    assert src.max() < ds.n_users and dst.max() < ds.n_users
    assert src.min() >= 1
    # undirected duplication: edge set symmetric
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    g = ds.get_norm_net_adj_graph()
    assert g.n_nodes == ds.n_users


def test_negative_sampler_avoids_used():
    users = np.array([1, 1, 2, 3])
    items = np.array([1, 2, 1, 4])
    s = UniformNegativeSampler(users, items, n_users=5, n_items=6)
    rng = np.random.default_rng(0)
    negs = s.sample(np.array([1] * 200), 1, rng).reshape(-1)
    assert set(negs.tolist()).isdisjoint({1, 2})
    assert negs.min() >= 1 and negs.max() < 6


def test_sampler_deterministic():
    users = np.arange(1, 50) % 5 + 1
    items = np.arange(1, 50) % 7 + 1
    s = UniformNegativeSampler(users, items, 6, 8)
    a = s.sample(users, 2, np.random.default_rng(42))
    b = s.sample(users, 2, np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)


def test_dataset_cache_roundtrip(tmp_path):
    cfg = make_config(save_dataset=True, checkpoint_dir=str(tmp_path))
    from recbole_gnn_tpu.quick_start import create_dataset
    a = create_dataset(cfg)
    b = create_dataset(cfg)   # second call loads the pickle
    np.testing.assert_array_equal(a.inter[a.uid_field], b.inter[b.uid_field])
    # changed filter config invalidates the cache
    cfg2 = make_config(save_dataset=True, checkpoint_dir=str(tmp_path),
                       val_interval={"rating": "[3,inf)"})
    c = create_dataset(cfg2)
    assert c.inter_num < a.inter_num


def test_native_session_graphs_match_numpy():
    from recbole_gnn_tpu.native import (
        build_session_graphs_native, native_available)
    if not native_available():
        pytest.skip("no native toolchain")
    from recbole_gnn_tpu.data.session import (
        _alias_per_row, _unique_per_row)
    from recbole_gnn_tpu.data.session import SessionGraphDataset
    rng = np.random.default_rng(3)
    N, L = 500, 20
    lengths = rng.integers(1, L + 1, N).astype(np.int32)
    seqs = np.where(np.arange(L)[None, :] < lengths[:, None],
                    rng.integers(1, 50, (N, L)), 0).astype(np.int32)
    nx, nn, na, ns, nd, ne = build_session_graphs_native(seqs, lengths)
    x, n_nodes = _unique_per_row(seqs)
    alias = _alias_per_row(x, n_nodes, seqs, lengths)
    src, dst, n_edges = SessionGraphDataset._consecutive_edges(
        alias, lengths, L)
    np.testing.assert_array_equal(nx, x)
    np.testing.assert_array_equal(nn, n_nodes)
    np.testing.assert_array_equal(na, alias)
    np.testing.assert_array_equal(ne, n_edges)
    np.testing.assert_array_equal(ns, src)
    np.testing.assert_array_equal(nd, dst)


def test_native_kcore_matches_numpy():
    from recbole_gnn_tpu.native import kcore_filter_native, native_available
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(4)
    users = rng.integers(0, 40, 2000)
    items = rng.integers(0, 100, 2000)
    keep = kcore_filter_native(users, items, 40, 100, 5, 10**9, 5, 10**9)
    # fixed point: all surviving users/items have >=5 interactions
    u, c = np.unique(users[keep], return_counts=True)
    i, ci = np.unique(items[keep], return_counts=True)
    assert (c >= 5).all() and (ci >= 5).all()
    # numpy reference loop produces the same mask
    ref = np.ones(2000, bool)
    while True:
        uu, cc = np.unique(users[ref], return_counts=True)
        ok_u = uu[cc >= 5]
        ii, cci = np.unique(items[ref], return_counts=True)
        ok_i = ii[cci >= 5]
        new = ref & np.isin(users, ok_u) & np.isin(items, ok_i)
        if (new == ref).all():
            break
        ref = new
    np.testing.assert_array_equal(keep, ref)


def test_multibehavior_dataset_fallback_single_behavior():
    from recbole_gnn_tpu.data.session import MultiBehaviorDataset
    cfg = make_config(model="SRGNN")
    ds = MultiBehaviorDataset(cfg)
    tr, _, _ = ds.build()
    g = tr.session_graphs
    assert "x__interaction" in g and "n_nodes__interaction" in g
    # single-behavior fallback: behavior node sets == joint node sets
    np.testing.assert_array_equal(g["x__interaction"], g["x"])
    np.testing.assert_array_equal(g["n_nodes__interaction"], g["n_nodes"])


def test_dataloader_cache_roundtrip(tmp_path):
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    cfg = make_config(model="SRGNN", save_dataloaders=True,
                      checkpoint_dir=str(tmp_path))
    ds = create_dataset(cfg)
    (tl1, tr1), _, _ = data_preparation(cfg, ds)
    assert (tmp_path / "test-SessionGraphDataset-splits.pth").exists()
    (tl2, tr2), _, _ = data_preparation(cfg, ds)   # loads from cache
    np.testing.assert_array_equal(tr1.session_graphs["x"],
                                  tr2.session_graphs["x"])
    b1, b2 = next(iter(tl1)), next(iter(tl2))
    np.testing.assert_array_equal(b1["item_seq"], b2["item_seq"])


def test_atomic_seq_fields(tmp_path):
    from recbole_gnn_tpu.data.atomic import read_atomic_file
    p = tmp_path / "t.inter"
    p.write_text("user_id:token\tvals:float_seq\ttags:token_seq\n"
                 "7\t0.5 1.25 -2\ta b\n"
                 "8\t3\tc\n")
    cols, types = read_atomic_file(str(p))
    assert types == {"user_id": "token", "vals": "float_seq",
                     "tags": "token_seq"}
    np.testing.assert_allclose(cols["vals"][0], [0.5, 1.25, -2.0])
    assert list(cols["tags"][0]) == ["a", "b"]
    assert list(cols["tags"][1]) == ["c"]


def test_bf16_dense_adjacency_error_bound():
    """graph_dtype bfloat16 propagation stays within bf16 tolerance of
    the f32 path (quality guardrail for the fast adjacency option)."""
    import jax.numpy as jnp
    from recbole_gnn_tpu.ops.spmm import spmm_any
    ds = GeneralGraphDataset(make_config())
    g32 = ds.get_norm_adj_graph()
    cfg16 = make_config(graph_dtype="bfloat16")
    ds16 = GeneralGraphDataset(cfg16)
    g16 = ds16.get_norm_adj_graph()
    assert g16.a.dtype == jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(g32.n_nodes, 16)), jnp.float32)
    o32 = np.asarray(spmm_any(g32, x))
    o16 = np.asarray(spmm_any(g16, x))
    # global normalized RMS error within bf16 tolerance
    rel = np.linalg.norm(o32 - o16) / np.linalg.norm(o32)
    assert rel < 0.01, rel


def test_gcegnn_global_graph_golden():
    """Hand-checked co-occurrence table (reference
    construct_global_graph semantics: counts over target x first-4
    history both ways, top-sample_num by count)."""
    import jax
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.config import Config

    class _DS:
        pass

    ds = _DS()
    ds.n_users, ds.n_items = 5, 6
    ds.iid_field = "item_id"
    ds.item_list_field = "item_id_list"
    ds.inter = {
        # two samples: target 3 with history [1,2]; target 1 with [3]
        "item_id": np.array([3, 1]),
        "item_id_list": np.array([[1, 2, 0, 0], [3, 0, 0, 0]]),
    }
    cfg = Config(model="GCEGNN", dataset="test",
                 config_dict={"data_path": "tests/test_data",
                              "sample_num": 2, "MAX_ITEM_LIST_LENGTH": 4})
    adj, w = get_model("GCEGNN")(cfg, ds)._construct_global_graph(ds)
    # pair (3,1) occurs twice (once from each sample, both directions),
    # (3,2) and (2,3)... : neighbors of 3 = {1: count 2, 2: count 1}
    assert list(adj[3]) == [1, 2]
    np.testing.assert_allclose(w[3], [2.0, 1.0])
    assert adj[1][0] == 3 and w[1][0] == 2.0
    assert adj[2][0] == 3 and w[2][0] == 1.0


def test_multibehavior_with_behavior_field(tmp_path):
    """MultiBehavior with a real behavior column: per-behavior node sets
    partition the joint node set."""
    d = tmp_path / "mb"
    d.mkdir()
    rng = np.random.default_rng(0)
    with open(d / "mb.inter", "w") as f:
        f.write("user_id:token\titem_id:token\tbehavior:token\t"
                "timestamp:float\n")
        for u in range(1, 40):
            for j in range(6):
                f.write(f"{u}\t{rng.integers(1, 30)}\t"
                        f"{'click' if j % 2 else 'buy'}\t{1000 + j}\n")
    from recbole_gnn_tpu.data.session import MultiBehaviorDataset
    cfg = make_config(
        model="SRGNN", dataset="mb", data_path=str(tmp_path),
        BEHAVIOR_ID_FIELD="behavior", ITEM_BEHAVIOR_LIST_FIELD="behavior_list",
        load_col={"inter": ["user_id", "item_id", "behavior", "timestamp"]})
    ds = MultiBehaviorDataset(cfg)
    tr, _, _ = ds.build()
    g = tr.session_graphs
    names = [k for k in g if k.startswith("x__")]
    assert len(names) >= 2   # two behaviors
    # each behavior's node count <= joint node count
    for n in names:
        cnt_key = "n_nodes__" + n[3:]
        assert (g[cnt_key] <= g["n_nodes"]).all()


def test_bipartite_graph_rectangular_shapes_and_vjp():
    """get_bipartite_graph returns a RECTANGULAR graph: n_nodes = rows,
    n_src_nodes = columns; forward aggregates column features into rows
    and the transpose-VJP uses the correct column count (was silently
    defaulting n_src_nodes to n_dst)."""
    import jax
    import jax.numpy as jnp
    from conftest import base_config_dict
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset
    from recbole_gnn_tpu.ops.spmm import spmm

    cfg = Config(config_dict=base_config_dict(model="LightGCN"))
    ds = create_dataset(cfg)
    g = ds.get_bipartite_graph(row="user", row_norm=True)
    assert g.n_nodes == ds.n_users and g.n_src_nodes == ds.n_items

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(ds.n_items, 8)), jnp.float32)
    out = spmm(g, x)
    assert out.shape == (ds.n_users, 8)
    # row-normalized: each user row is the mean of its items' features
    users, items = ds.user_item_arrays()
    u0 = int(users[0])
    mine = items[users == u0]
    np.testing.assert_allclose(np.asarray(out[u0]),
                               np.asarray(x[mine].mean(axis=0)),
                               rtol=1e-4, atol=1e-5)
    # transpose-VJP: gradient lands on the ITEM axis with item count
    cot = jnp.asarray(rng.normal(size=(ds.n_users, 8)), jnp.float32)
    grad = jax.grad(lambda x_: jnp.sum(spmm(g, x_) * cot))(x)
    assert grad.shape == (ds.n_items, 8)
    ref = jax.ops.segment_sum(
        (cot[g.dst] * g.weight[:, None]), g.src,
        num_segments=ds.n_items)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
