"""Unit tests for the kernel layer (ops/) — what the reference lacks
(SURVEY.md §4): segment ops / SpMM vs dense reference, normalizations,
k-means, randomized SVD, top-k."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recbole_gnn_tpu.ops import (
    segment_sum, segment_mean, segment_max, segment_softmax,
    spmm, Graph, sym_norm_weights, row_norm_weights,
    edge_dropout_mask, kmeans, randomized_svd, chunked_full_sort_topk,
)
from recbole_gnn_tpu.ops.spmm import build_graph
from recbole_gnn_tpu.ops.svd import randomized_svd_sparse


def dense_from_coo(src, dst, w, n):
    m = np.zeros((n, n), dtype=np.float64)
    for s, d, x in zip(src, dst, w):
        m[d, s] += x
    return m


def random_graph(rng, n=50, e=300):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e)
    return src, dst, w, n


def test_spmm_matches_dense():
    rng = np.random.default_rng(0)
    src, dst, w, n = random_graph(rng)
    x = rng.normal(size=(n, 16))
    g = build_graph(src, dst, w, n)
    out = np.asarray(spmm(g, jnp.asarray(x, jnp.float32)))
    want = dense_from_coo(src, dst, w, n) @ x
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)


def test_graph_reverse_is_transpose():
    rng = np.random.default_rng(1)
    src, dst, w, n = random_graph(rng)
    g = build_graph(src, dst, w, n)
    gt = g.reverse()
    x = rng.normal(size=(n, 8)).astype(np.float32)
    out = np.asarray(spmm(gt, jnp.asarray(x)))
    want = dense_from_coo(src, dst, w, n).T @ x
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)


def test_segment_mean_empty_segments():
    data = jnp.array([[1.0], [3.0], [5.0]])
    ids = jnp.array([0, 0, 2])
    out = np.asarray(segment_mean(data, ids, 4))
    np.testing.assert_allclose(out[:, 0], [2.0, 0.0, 5.0, 0.0])


def test_segment_softmax_sums_to_one():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=40), jnp.float32)
    ids = jnp.asarray(np.sort(rng.integers(0, 6, 40)))
    p = segment_softmax(logits, ids, 6)
    sums = np.asarray(segment_sum(p, ids, 6))
    present = np.unique(np.asarray(ids))
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_segment_softmax_mask():
    logits = jnp.array([1.0, 2.0, 3.0, 4.0])
    ids = jnp.array([0, 0, 1, 1])
    mask = jnp.array([True, False, True, True])
    p = np.asarray(segment_softmax(logits, ids, 2, mask=mask))
    assert p[1] == 0.0
    np.testing.assert_allclose(p[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(p[2] + p[3], 1.0, rtol=1e-6)


def test_sym_norm_matches_manual():
    src = jnp.array([0, 1, 1, 2])
    dst = jnp.array([1, 0, 2, 1])
    w = np.asarray(sym_norm_weights(src, dst, 3))
    # deg over dst: node0:1, node1:2, node2:1
    want = [1 / np.sqrt(1 * 2), 1 / np.sqrt(2 * 1), 1 / np.sqrt(2 * 1),
            1 / np.sqrt(1 * 2)]
    np.testing.assert_allclose(w, want, rtol=1e-6)


def test_row_norm_rows_sum_to_one():
    rng = np.random.default_rng(3)
    src, dst, _, n = random_graph(rng, n=20, e=100)
    w = np.asarray(row_norm_weights(jnp.asarray(src), jnp.asarray(dst), n))
    sums = np.zeros(n)
    np.add.at(sums, dst, w)
    present = np.unique(dst)
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_edge_dropout_mask_rate():
    rng = jax.random.PRNGKey(0)
    m = np.asarray(edge_dropout_mask(rng, 100_000, 0.3))
    assert abs(m.mean() - 0.7) < 0.01


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(100, 8)) + 10
    b = rng.normal(size=(100, 8)) - 10
    x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    _, assign = kmeans(jax.random.PRNGKey(1), x, 2, n_iter=10)
    assign = np.asarray(assign)
    assert len(np.unique(assign[:100])) == 1
    assert len(np.unique(assign[100:])) == 1
    assert assign[0] != assign[150]


def test_randomized_svd_low_rank_recovery():
    rng = np.random.default_rng(5)
    u = rng.normal(size=(60, 5))
    v = rng.normal(size=(40, 5))
    a = (u @ v.T).astype(np.float32)
    mv = lambda x: jnp.asarray(a) @ x
    rmv = lambda y: jnp.asarray(a.T) @ y
    U, s, V = randomized_svd(jax.random.PRNGKey(2), mv, rmv, 60, 40, q=5)
    approx = np.asarray(U) * np.asarray(s) @ np.asarray(V).T
    np.testing.assert_allclose(approx, a, rtol=1e-3, atol=1e-3)


def test_randomized_svd_sparse_matches_dense_svd():
    rng = np.random.default_rng(6)
    src = rng.integers(0, 30, 200)
    dst = rng.integers(0, 25, 200)
    w = rng.normal(size=200).astype(np.float32)
    dense = np.zeros((30, 25), dtype=np.float64)
    np.add.at(dense, (src, dst), w)
    U, s, V = randomized_svd_sparse(
        jax.random.PRNGKey(3), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(w), 30, 25, q=5, n_power_iter=4)
    s_ref = np.linalg.svd(dense, compute_uv=False)[:5]
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-2)


def test_chunked_topk_matches_full():
    rng = np.random.default_rng(7)
    ue = jnp.asarray(rng.normal(size=(37, 8)), jnp.float32)
    ie = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    hist = jnp.zeros((37, 50), dtype=bool)
    v1, i1 = chunked_full_sort_topk(ue, ie, hist, k=5, chunk=8)
    scores = np.asarray(ue) @ np.asarray(ie).T
    want = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i1), want)


def test_spmm_custom_vjp_grad_matches_autodiff():
    rng = np.random.default_rng(8)
    src, dst, w, n = random_graph(rng, n=30, e=150)
    g = build_graph(src, dst, w, n)
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)

    def f_custom(x_):
        return jnp.sum(spmm(g, x_) * cot)

    def f_ref(x_):
        from recbole_gnn_tpu.ops.spmm import spmm_coo
        return jnp.sum(spmm_coo(g.src, g.dst, g.weight, x_, n) * cot)

    g1 = np.asarray(jax.grad(f_custom)(x))
    g2 = np.asarray(jax.grad(f_ref)(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-4)


def test_spmm_weight_grad():
    rng = np.random.default_rng(9)
    src, dst, w, n = random_graph(rng, n=20, e=60)
    g = build_graph(src, dst, w, n)
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)

    def f(w_):
        return jnp.sum(spmm(g.with_weight(w_), x, weight_grad=True) * cot)

    gw = np.asarray(jax.grad(f)(g.weight))
    want = np.asarray([np.dot(np.asarray(x)[s], np.asarray(cot)[d])
                       for s, d in zip(np.asarray(g.src), np.asarray(g.dst))])
    np.testing.assert_allclose(gw, want, rtol=1e-4, atol=1e-4)


def test_ell_spmm_matches_dense():
    """The bucketed-ELL layout (round-3 default sparse path) must be
    exact vs the dense reference — incl. forced virtual-row splits
    (k_cap=4) and bucket-grid padding."""
    from recbole_gnn_tpu.ops.ell_spmm import build_ell, ell_spmm
    rng = np.random.default_rng(11)
    src, dst, w, n = random_graph(rng, n=40, e=500)  # avg deg 12.5 > cap
    order = np.argsort(dst, kind="stable")
    s, d, ww = src[order], dst[order], w[order].astype(np.float32)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    want = dense_from_coo(src, dst, w, n) @ x
    for k_cap, mb in ((256, 12), (4, 12), (16, 2), (256, 1)):
        meta = build_ell(s, d, ww, n, k_cap=k_cap, max_buckets=mb)
        assert meta.e_padded >= len(s)
        assert len(meta.idxs) <= mb
        out = np.asarray(ell_spmm(meta, jnp.asarray(x)))
        np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"k_cap={k_cap} mb={mb}")


def test_ell_spmm_isolated_nodes_and_rectangular():
    from recbole_gnn_tpu.ops.ell_spmm import build_ell, ell_spmm
    rng = np.random.default_rng(12)
    n_src, n_dst, e = 30, 20, 80
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst - 5, e)   # last 5 dst rows isolated
    w = rng.normal(size=e).astype(np.float32)
    order = np.argsort(dst, kind="stable")
    x = rng.normal(size=(n_src, 8)).astype(np.float32)
    meta = build_ell(src[order], dst[order], w[order], n_dst)
    out = np.asarray(ell_spmm(meta, jnp.asarray(x)))
    want = np.zeros((n_dst, 8))
    np.add.at(want, dst, w[:, None].astype(np.float64) * x[src])
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(out[-5:], 0.0)


def test_ell_spmm_chunked_bucket_matches_unchunked(monkeypatch):
    """Web-scale guard: buckets over BUCKET_BYTES_BUDGET process in
    static row chunks — must be bit-identical to the unchunked path."""
    import recbole_gnn_tpu.ops.ell_spmm as ell_mod
    rng = np.random.default_rng(15)
    src, dst, w, n = random_graph(rng, n=60, e=700)
    order = np.argsort(dst, kind="stable")
    meta = ell_mod.build_ell(src[order], dst[order],
                             w[order].astype(np.float32), n)
    x = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
    full = np.asarray(ell_mod.ell_spmm(meta, x))
    monkeypatch.setattr(ell_mod, "BUCKET_BYTES_BUDGET", 4096)
    chunked = np.asarray(ell_mod.ell_spmm(meta, x))
    np.testing.assert_array_equal(full, chunked)


def test_spmm_ell_path_grad_matches_segsum():
    """spmm() with SPMM_IMPL='ell': forward AND x-gradient (transpose
    ELL over rev layout) must match the segment-sum path."""
    import importlib
    spmm_mod = importlib.import_module("recbole_gnn_tpu.ops.spmm")
    rng = np.random.default_rng(13)
    src, dst, w, n = random_graph(rng, n=35, e=400)
    g = build_graph(src, dst, w, n)
    assert g.ell is not None and g.rev_ell is not None
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)

    def run():
        out = spmm(g, x)
        grad = jax.grad(lambda x_: jnp.sum(spmm(g, x_) * cot))(x)
        return np.asarray(out), np.asarray(grad)

    old = spmm_mod.SPMM_IMPL
    try:
        spmm_mod.SPMM_IMPL = "ell"
        out_e, grad_e = run()
        spmm_mod.SPMM_IMPL = "xla"
        out_x, grad_x = run()
    finally:
        spmm_mod.SPMM_IMPL = old
    np.testing.assert_allclose(out_e, out_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(grad_e, grad_x, rtol=1e-4, atol=1e-4)


def test_with_weight_clears_ell():
    """Re-weighted graphs must NOT run on the stale baked-weight ELL:
    with_weight clears it and spmm falls back to segment-sum."""
    import importlib
    spmm_mod = importlib.import_module("recbole_gnn_tpu.ops.spmm")
    rng = np.random.default_rng(14)
    src, dst, w, n = random_graph(rng, n=30, e=200)
    g = build_graph(src, dst, w, n)
    g2 = g.with_weight(g.weight * 0.5)
    assert g2.ell is None and g2.rev_ell is None
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    old = spmm_mod.SPMM_IMPL
    try:
        spmm_mod.SPMM_IMPL = "ell"
        out = np.asarray(spmm(g2, x))
    finally:
        spmm_mod.SPMM_IMPL = old
    np.testing.assert_allclose(out, 0.5 * np.asarray(spmm(g, x)),
                               rtol=1e-5, atol=1e-5)


def test_with_weight_rebuild_ell_matches_segsum():
    """Epoch-level dynamic weights (SGL/SEPT): with_weight(...,
    rebuild_ell=True) regathers the ELL slot weights via the recorded
    edge ids — forward AND x-grad must match the segment-sum path on
    the new weights."""
    import importlib
    spmm_mod = importlib.import_module("recbole_gnn_tpu.ops.spmm")
    rng = np.random.default_rng(16)
    src, dst, w, n = random_graph(rng, n=30, e=240)
    g = build_graph(src, dst, w, n)
    new_w = g.weight * jnp.asarray(
        rng.random(len(src)) > 0.3, jnp.float32)   # static-nnz dropout
    g2 = g.with_weight(new_w, rebuild_ell=True)
    assert g2.ell is not None and g2.rev_ell is not None
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)

    def run():
        out = spmm(g2, x)
        grad = jax.grad(lambda x_: jnp.sum(spmm(g2, x_) * cot))(x)
        return np.asarray(out), np.asarray(grad)

    old = spmm_mod.SPMM_IMPL
    try:
        spmm_mod.SPMM_IMPL = "ell"
        out_e, grad_e = run()
        spmm_mod.SPMM_IMPL = "xla"
        out_x, grad_x = run()
    finally:
        spmm_mod.SPMM_IMPL = old
    np.testing.assert_allclose(out_e, out_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(grad_e, grad_x, rtol=1e-4, atol=1e-4)


def test_sgl_sparse_ell_views_match_segsum():
    """SGL's per-epoch augmented views on the sparse path: the
    extras-carried regathered ELL slot weights must produce exactly
    the loss of the segment-sum fallback."""
    import importlib
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from conftest import base_config_dict
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
    from recbole_gnn_tpu.models import get_model
    spmm_mod = importlib.import_module("recbole_gnn_tpu.ops.spmm")

    cfg = Config(config_dict=base_config_dict(
        model="SGL", epochs=1, enable_sparse=True))
    ds = create_dataset(cfg)
    (tl, tr_ds), _, _ = data_preparation(cfg, ds)
    model = get_model("SGL")(cfg, tr_ds)
    params = model.init_params(jax.random.PRNGKey(0))
    extras = model.init_extras(jax.random.PRNGKey(1))
    assert "view1_ell" in extras
    batch = next(iter(tl))
    rng = jax.random.PRNGKey(2)

    old = spmm_mod.SPMM_IMPL
    try:
        spmm_mod.SPMM_IMPL = "ell"
        l_ell, _ = model.calculate_loss(params, model.consts, extras,
                                        batch, rng)
        # strip the ELL extras → segsum fallback (with_weight path)
        extras2 = {k: v for k, v in extras.items() if "ell" not in k}
        spmm_mod.SPMM_IMPL = "xla"
        l_xla, _ = model.calculate_loss(params, model.consts, extras2,
                                        batch, rng)
    finally:
        spmm_mod.SPMM_IMPL = old
    np.testing.assert_allclose(float(l_ell), float(l_xla), rtol=1e-4)


def test_spmm_weight_grad_default_is_zero():
    """Contract pin: spmm's DEFAULT is weight_grad=False — the weight
    cotangent is an all-zeros placeholder.  Any future model whose edge
    weights depend on params (attention) MUST pass weight_grad=True
    (see models/__init__.py registry doc)."""
    rng = np.random.default_rng(9)
    src, dst, w, n = random_graph(rng, n=20, e=60)
    g = build_graph(src, dst, w, n)
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    gw = np.asarray(jax.grad(
        lambda w_: jnp.sum(spmm(g.with_weight(w_), x) * cot))(g.weight))
    np.testing.assert_array_equal(gw, np.zeros_like(gw))


def test_reverse_graph_backward_consistent():
    rng = np.random.default_rng(10)
    src, dst, w, n = random_graph(rng, n=25, e=120)
    g = build_graph(src, dst, w, n)
    gr = g.reverse()
    x = jnp.asarray(rng.normal(size=(n, 6)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n, 6)), jnp.float32)
    grad = np.asarray(jax.grad(lambda x_: jnp.sum(spmm(gr, x_) * cot))(x))
    want = np.asarray(jax.grad(
        lambda x_: jnp.sum(spmm_coo_ref(dst, src, w, x_, n) * cot))(x))
    np.testing.assert_allclose(grad, want, rtol=1e-4, atol=1e-4)


def spmm_coo_ref(src, dst, w, x, n):
    from recbole_gnn_tpu.ops.spmm import spmm_coo
    order = np.argsort(dst, kind="stable")
    return spmm_coo(jnp.asarray(src[order]), jnp.asarray(dst[order]),
                    jnp.asarray(w[order]), x, n)


def test_pallas_spmm_interpret_matches_xla():
    """Streaming Pallas kernel vs XLA reference (interpret mode on CPU;
    the same kernel compiles on TPU)."""
    from recbole_gnn_tpu.ops.pallas_spmm import (
        pallas_spmm, prepare_pallas_graph)
    rng = np.random.default_rng(11)
    n, e, d = 300, 5000, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    s, d_, w_, meta = prepare_pallas_graph(src, dst, w, n)
    out = pallas_spmm(jnp.asarray(s), jnp.asarray(d_), jnp.asarray(w_),
                      x, meta, interpret=True)[:n]
    msgs = x[jnp.asarray(s)] * jnp.asarray(w_)[:, None]
    ref = jax.ops.segment_sum(msgs, jnp.asarray(d_), num_segments=n,
                              indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_pallas_spmm_streaming_multisegment():
    """Forced multi-segment layout: partial sums from several scan
    steps must accumulate exactly (in-place aliasing), including
    destination blocks split across segment boundaries and
    pass-through programs."""
    from recbole_gnn_tpu.ops.pallas_spmm import (
        build_pallas_meta, pad_edges, pallas_spmm)
    rng = np.random.default_rng(21)
    n, e, d = 100, 1000, 64
    # skewed dst so hub blocks span multiple segments
    dst = (rng.zipf(1.3, size=e) % n).astype(np.int64)
    src = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ec, seg_max, bm = 64, 256, 32
    s, d_, w_ = pad_edges(src, dst, w, n, ec=ec, seg_max=seg_max)
    meta = build_pallas_meta(d_, n, bm=bm, ec=ec, seg_max=seg_max)
    assert meta.n_seg > 1
    out = pallas_spmm(jnp.asarray(s), jnp.asarray(d_), jnp.asarray(w_),
                      x, meta, interpret=True)[:n]
    msgs = x[jnp.asarray(s)] * jnp.asarray(w_)[:, None]
    ref = jax.ops.segment_sum(msgs, jnp.asarray(d_), num_segments=n,
                              indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
    # every precision mode agrees at its documented tolerance:
    # packed/f32x2 carry f32-grade info; bf16 ~3 digits
    for prec, rtol, atol in (("packed", 2e-3, 2e-4),
                             ("f32x2", 2e-3, 2e-4),
                             ("bf16", 0.1, 0.15)):
        outp = pallas_spmm(jnp.asarray(s), jnp.asarray(d_),
                           jnp.asarray(w_), x, meta,
                           precision=prec, interpret=True)[:n]
        np.testing.assert_allclose(np.asarray(outp), np.asarray(ref),
                                   rtol=rtol, atol=atol, err_msg=prec)


def test_pallas_spmm_block_overrun_segments():
    """Regression: a segment whose blk_lo + max_blk overruns the real
    destination blocks must not corrupt the LAST blocks.  Before the
    scratch-block fix, the overrun pass-through programs' out index
    clamped onto the last real block and overwrote it with a stale
    prefetched copy — uniform dst at n >> bm with multiple segments
    triggers it (first segment spans many blocks → large max_blk; a
    later segment starts high → blk_lo + max_blk > n_blocks)."""
    from recbole_gnn_tpu.ops.pallas_spmm import (
        build_pallas_meta, pad_edges, pallas_spmm)
    rng = np.random.default_rng(5)
    n, e, d = 1000, 5000, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)     # uniform → later segments start high
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    # default bm=512 → n_blocks=2; seg_max=4096 → 2 segments; segment 1
    # has blk_lo=1 and the grid maps programs past block 1
    s, d_, w_ = pad_edges(src, dst, w, n, seg_max=4096)
    meta = build_pallas_meta(d_, n, seg_max=4096)
    assert meta.n_seg > 1
    assert int(np.asarray(meta.blk_lo).max()) + meta.max_blk > meta.n_blocks
    msgs = x[jnp.asarray(s)] * jnp.asarray(w_)[:, None]
    ref = jax.ops.segment_sum(msgs, jnp.asarray(d_), num_segments=n,
                              indices_are_sorted=True)
    for prec in ("packed", "f32x2"):
        out = pallas_spmm(jnp.asarray(s), jnp.asarray(d_),
                          jnp.asarray(w_), x, meta,
                          precision=prec, interpret=True)[:n]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-4, err_msg=prec)


def test_pallas_graph_vjp_matches_plain_graph():
    """build_graph(with_pallas=True) must give identical fwd/bwd on the
    non-TPU fallback path (padding + block ptrs are inert)."""
    rng = np.random.default_rng(12)
    n, e = 100, 1000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    g1 = build_graph(src, dst, w, n)
    g2 = build_graph(src, dst, w, n, with_pallas=True)
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(spmm(g1, x)),
                               np.asarray(spmm(g2, x)), rtol=1e-4, atol=1e-4)
    cot = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    ga = np.asarray(jax.grad(lambda x_: jnp.sum(spmm(g1, x_) * cot))(x))
    gb = np.asarray(jax.grad(lambda x_: jnp.sum(spmm(g2, x_) * cot))(x))
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-4)


def test_spmm_chunked_matches_unchunked():
    from recbole_gnn_tpu.ops.spmm import _spmm_coo_chunked, spmm_coo
    rng = np.random.default_rng(13)
    src, dst, w, n = random_graph(rng, n=40, e=333)
    order = np.argsort(dst, kind="stable")
    src, dst, w = (jnp.asarray(src[order]), jnp.asarray(dst[order]),
                   jnp.asarray(w[order], jnp.float32))
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    want = np.asarray(spmm_coo(src, dst, w, x, n))
    got = np.asarray(_spmm_coo_chunked(src, dst, w, x, n, True, chunk=50))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grouped_topk_exact():
    """Two-stage grouped top-k must equal lax.top_k exactly, including
    duplicate scores and NEG_INF-padded tails."""
    from recbole_gnn_tpu.ops.topk import grouped_topk
    rng = np.random.default_rng(30)
    B, n, k = 7, 100_000, 10
    scores = rng.normal(size=(B, n)).astype(np.float32)
    scores[0, :5000] = 3.14          # duplicates straddling groups
    v1, i1 = grouped_topk(jnp.asarray(scores), k, group=8192)
    v2, i2 = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    # indices may differ among equal values; values must match and the
    # returned indices must actually hold those values
    got = np.take_along_axis(scores, np.asarray(i1), axis=1)
    np.testing.assert_allclose(got, np.asarray(v2))


def test_gather_slots_exact_forward_and_matmul_backward():
    """gather_slots: forward must equal take_along_axis exactly (r4
    review: the one-hot-einsum form rounded f32 on TPU's bf16-class
    default matmul precision); backward (one-hot matmul) must equal
    autodiff of the plain gather."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from recbole_gnn_tpu.models.sequential.common import gather_slots

    rng = np.random.default_rng(0)
    B, S, L, D = 4, 7, 5, 8
    hidden = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, S, (B, L)))
    ref = jnp.take_along_axis(hidden, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(gather_slots(hidden, idx)),
                                  np.asarray(ref))
    cot = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    g1 = jax.grad(lambda h: jnp.sum(gather_slots(h, idx) * cot))(hidden)
    g2 = jax.grad(lambda h: jnp.sum(
        jnp.take_along_axis(h, idx[:, :, None], axis=1) * cot))(hidden)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_info_nce_chunked_lse_matches_unchunked(monkeypatch):
    """Web-scale InfoNCE denominators stream through a chunked
    logsumexp (SGL's all-node negatives at gowalla scale would build
    an 18 GiB logits buffer — r4); forced-chunked fwd and both grads
    must match the one-shot form."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import recbole_gnn_tpu.models.losses as L

    rng = np.random.default_rng(0)
    v1 = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    av2 = jnp.asarray(rng.normal(size=(3001, 16)).astype(np.float32))
    ref = L.info_nce(v1, v2, 0.2, all_view2=av2)
    g_ref = jax.grad(lambda a: L.info_nce(v1, v2, 0.2, all_view2=a))(av2)
    monkeypatch.setattr(L, "_NCE_CHUNK_ENTRIES", 1000)  # 3 chunks + pad
    got = L.info_nce(v1, v2, 0.2, all_view2=av2)
    g_got = jax.grad(lambda a: L.info_nce(v1, v2, 0.2, all_view2=a))(av2)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-6)
