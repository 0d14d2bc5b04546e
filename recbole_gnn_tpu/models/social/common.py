"""Shared social-model helpers — scipy-sparse → device-matrix dispatch.

The social family's precomputed matrices (motif channels, friend /
sharing views, row-normalized net / interest blocks) are built host-side
with scipy sparse algebra (SURVEY.md §2.6) and must NOT densify on the
way to the device at web scale: an n_users² dense matrix is 40 GB at
100k users.  The reference keeps these sparse end-to-end
(reference mhcn.py:129-166); here the device form is chosen by size —
dense jnp (MXU fast path) under ``dense_graph_max_entries``, COO
:class:`Graph` (segment/Pallas path) above it.  ``matvec_any``
dispatches at apply time, so models are representation-agnostic.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from recbole_gnn_tpu.ops.spmm import Graph, build_graph


def to_device_matrix(m, config, force_sparse: bool = False):
    """scipy sparse (n_rows, n_cols) → dense jnp array or COO Graph.

    The Graph's dst indexes rows and src columns, so
    ``matvec_any(g, x)`` computes ``m @ x`` for either representation.
    """
    import jax.numpy as jnp

    m = sp.coo_matrix(m)
    n_rows, n_cols = m.shape
    max_entries = int(config.get("dense_graph_max_entries", 3e8))
    use_dense = (not force_sparse
                 and config["enable_sparse"] is not True
                 and n_rows * n_cols <= max_entries)
    if use_dense:
        return jnp.asarray(np.asarray(m.todense(), dtype=np.float32))
    with_pallas = config["use_pallas_spmm"] is not False
    return build_graph(m.col.astype(np.int64), m.row.astype(np.int64),
                       m.data.astype(np.float32),
                       n_nodes=n_rows, n_src_nodes=n_cols,
                       with_pallas=with_pallas)


def row_normalize(m) -> sp.csr_matrix:
    """Sparse row normalization x → x / (row_sum + 1e-7) (reference
    mhcn.py row norms — same epsilon)."""
    m = sp.csr_matrix(m, dtype=np.float64)
    rs = np.asarray(m.sum(axis=1)).ravel()
    return sp.diags(1.0 / (rs + 1e-7)).dot(m).tocsr()


def sym_normalize_support(m) -> sp.csr_matrix:
    """Binary-support symmetric normalization: weights derive from the
    UNWEIGHTED degree of the support (reference sept.py
    get_norm_edge_weight :84-90 rebuilds views from indices only)."""
    m = sp.csr_matrix(m)
    m_bin = sp.csr_matrix(
        (np.ones_like(m.data), m.indices, m.indptr), shape=m.shape)
    m_bin.sum_duplicates()
    m_bin.data = np.ones_like(m_bin.data)
    deg = np.asarray(m_bin.sum(axis=1)).ravel()
    dinv = 1.0 / np.sqrt(np.where(deg == 0, 1.0, deg))
    coo = m_bin.tocoo()
    vals = dinv[coo.row] * dinv[coo.col]
    return sp.csr_matrix((vals, (coo.row, coo.col)), shape=m.shape)
