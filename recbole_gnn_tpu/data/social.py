"""Social dataset: .net loading, joint user remap, social adjacency.

Equivalent of the reference's SocialDataset (reference:
recbole_gnn/data/dataset.py:303-456): loads ``<dataset>.net``, applies
optional undirected duplication, filters net users absent from the
interactions, remaps user ids *jointly* across inter + net (alias
group), and exposes normalized U-U social adjacency as a static Graph.
"""

from __future__ import annotations

import os

import numpy as np

from recbole_gnn_tpu.data.atomic import read_atomic_file, atomic_path
from recbole_gnn_tpu.data.dataset import GeneralGraphDataset
from recbole_gnn_tpu.ops.spmm import Graph, build_graph


class SocialDataset(GeneralGraphDataset):

    def __init__(self, config, _defer_processing: bool = False):
        self.net: dict[str, np.ndarray] = {}
        self.net_src_field = config["NET_SOURCE_ID_FIELD"] or "source_id"
        self.net_tgt_field = config["NET_TARGET_ID_FIELD"] or "target_id"
        super().__init__(config, _defer_processing=_defer_processing)

    def _load_side_tables(self, sep, seq_sep, load_col, data_path):
        super()._load_side_tables(sep, seq_sep, load_col, data_path)
        path = atomic_path(data_path, self.dataset_name, "net")
        if not os.path.isfile(path):
            raise FileNotFoundError(f"social dataset needs a .net file: {path}")
        usecols = list(load_col.get("net")) if load_col.get("net") else None
        self.net, ftypes = read_atomic_file(path, sep, seq_sep, usecols)
        self.field2type.update(ftypes)
        if self.config["undirected_net"] is not False:
            src = self.net[self.net_src_field]
            tgt = self.net[self.net_tgt_field]
            self.net[self.net_src_field] = np.concatenate([src, tgt])
            self.net[self.net_tgt_field] = np.concatenate([tgt, src])

    def _process(self):
        self._filter_by_value()
        self._filter_by_inter_num()
        if self.config["filter_net_by_inter"] is not False:
            self._filter_net_by_inter()
        self._remap_ids()

    def _filter_net_by_inter(self):
        inter_uids = set(self.inter[self.uid_field].tolist())
        src = self.net[self.net_src_field]
        tgt = self.net[self.net_tgt_field]
        keep = np.fromiter(
            ((s in inter_uids) and (t in inter_uids) for s, t in zip(src, tgt)),
            bool, len(src))
        self.net = {k: v[keep] for k, v in self.net.items()}

    def _alias_groups(self):
        # user ids share one vocabulary across inter + net (reference
        # `_init_alias`, dataset.py:397-421); side-table fields join too
        groups = super()._alias_groups()
        groups[0] = groups[0] + [("net", self.net_src_field),
                                 ("net", self.net_tgt_field)]
        return groups

    def _table(self, name):
        return self.net if name == "net" else super()._table(name)

    @property
    def net_num(self) -> int:
        return len(self.net[self.net_src_field])

    def net_edges(self) -> tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self.net[self.net_src_field], dtype=np.int64),
                np.asarray(self.net[self.net_tgt_field], dtype=np.int64))

    def get_norm_net_adj_graph(self, row_norm: bool = False) -> Graph:
        """Normalized U-U social adjacency (reference
        `get_norm_net_adj_mat`, dataset.py:425-445): degree taken over
        the *source* endpoint; sym → 1/√(d[src]·d[dst]) (undirected nets
        have equal in/out degree), row → 1/d[src] per source row."""
        src, dst = self.net_edges()
        deg = np.bincount(src, minlength=self.n_users).astype(np.float64)
        safe = np.where(deg == 0, 1.0, deg)
        if row_norm:
            w = (1.0 / safe)[src]
        else:
            inv_sqrt = 1.0 / np.sqrt(safe)
            w = inv_sqrt[src] * inv_sqrt[dst]
        # Graph convention: dst receives; the reference propagates along
        # src→tgt, so dst = tgt here.
        return build_graph(src, dst, w, self.n_users,
                           with_pallas=self.config["use_pallas_spmm"]
                           is not False)

    def net_coo(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Raw social COO (deduplicated), for host-side motif algebra
        (MHCN/SEPT preprocessing)."""
        src, dst = self.net_edges()
        key = src * self.n_users + dst
        _, first = np.unique(key, return_index=True)
        return (src[first], dst[first], np.ones(len(first), dtype=np.float32))
