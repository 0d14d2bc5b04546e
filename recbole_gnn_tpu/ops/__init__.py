"""Kernel layer: TPU-native graph primitives.

Replaces the reference's native deps (torch_scatter / torch_sparse /
PyG propagate / faiss / DGL — see SURVEY.md §2.6) with JAX segment ops,
an XLA/Pallas SpMM, pure-JAX k-means and randomized SVD.
"""

from recbole_gnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from recbole_gnn_tpu.ops.spmm import (
    spmm, spmm_coo, spmm_any, Graph, BipartiteDenseGraph)
from recbole_gnn_tpu.ops.graphops import (
    edge_dropout_mask,
    degree,
    sym_norm_weights,
    row_norm_weights,
)
from recbole_gnn_tpu.ops.topk import chunked_full_sort_topk
from recbole_gnn_tpu.ops.kmeans import kmeans
from recbole_gnn_tpu.ops.svd import randomized_svd

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_softmax",
    "spmm", "spmm_coo", "spmm_any", "Graph", "BipartiteDenseGraph",
    "edge_dropout_mask", "degree", "sym_norm_weights", "row_norm_weights",
    "chunked_full_sort_topk", "kmeans", "randomized_svd",
]
