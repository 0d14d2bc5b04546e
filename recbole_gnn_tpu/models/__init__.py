"""Model registry — name → (module, class, type, dataset class).

Equivalent of the reference's registries/factories (reference:
recbole_gnn/utils.py:16-165): `get_model`, dataset-class resolution
precedence, and the SOCIAL model type.  The zoo is a superset of the
reference's 20 GNN models plus the RecBole fallback baselines its
tests exercise (BPR, NeuMF, GRU4Rec, NARM, SASRec — test_model.py).

When ADDING a model whose edge weights are a *function of parameters*
(GAT-style attention over a Graph): ops.spmm defaults to
``weight_grad=False`` — the weight cotangent is a silent zeros
placeholder.  Pass ``weight_grad=True`` at every spmm call or the
attention gets no gradient (contract pinned by
tests/test_ops.py::test_spmm_weight_grad_default_is_zero).  Every
current model is safe: dropout/augmentation weights come from RNG
masks, never from params.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass

from recbole_gnn_tpu.utils.enums import ModelType


@dataclass(frozen=True)
class ModelInfo:
    name: str
    module: str
    class_name: str
    model_type: ModelType
    dataset_class: str   # name in recbole_gnn_tpu.data


_G = ModelType.GENERAL
_S = ModelType.SEQUENTIAL
_SO = ModelType.SOCIAL

_REGISTRY: dict[str, ModelInfo] = {}


def _reg(name, module, class_name, mtype, dataset_class):
    _REGISTRY[name.lower()] = ModelInfo(name, module, class_name, mtype,
                                        dataset_class)


# -- general graph recommenders (reference §2.3) -----------------------
_reg("LightGCN", "general.lightgcn", "LightGCN", _G, "GeneralGraphDataset")
_reg("NGCF", "general.ngcf", "NGCF", _G, "GeneralGraphDataset")
_reg("SGL", "general.sgl", "SGL", _G, "GeneralGraphDataset")
_reg("SimGCL", "general.simgcl", "SimGCL", _G, "GeneralGraphDataset")
_reg("XSimGCL", "general.xsimgcl", "XSimGCL", _G, "GeneralGraphDataset")
_reg("NCL", "general.ncl", "NCL", _G, "GeneralGraphDataset")
_reg("HMLET", "general.hmlet", "HMLET", _G, "GeneralGraphDataset")
_reg("DirectAU", "general.directau", "DirectAU", _G, "GeneralGraphDataset")
_reg("LightGCL", "general.lightgcl", "LightGCL", _G, "GeneralGraphDataset")
_reg("SSL4REC", "general.ssl4rec", "SSL4REC", _G, "GeneralGraphDataset")

# -- sequential session-graph recommenders (reference §2.4) ------------
_reg("SRGNN", "sequential.srgnn", "SRGNN", _S, "SessionGraphDataset")
_reg("GCSAN", "sequential.gcsan", "GCSAN", _S, "SessionGraphDataset")
_reg("NISER", "sequential.niser", "NISER", _S, "SessionGraphDataset")
_reg("TAGNN", "sequential.tagnn", "TAGNN", _S, "SessionGraphDataset")
_reg("SGNNHN", "sequential.sgnnhn", "SGNNHN", _S, "SessionGraphDataset")
_reg("GCEGNN", "sequential.gcegnn", "GCEGNN", _S, "GCEGNNDataset")
_reg("LESSR", "sequential.lessr", "LESSR", _S, "LESSRDataset")

# -- social recommenders (reference §2.5) ------------------------------
_reg("DiffNet", "social.diffnet", "DiffNet", _SO, "SocialDataset")
_reg("MHCN", "social.mhcn", "MHCN", _SO, "SocialDataset")
_reg("SEPT", "social.sept", "SEPT", _SO, "SocialDataset")

# -- RecBole fallback baselines the reference's tests exercise ----------
_reg("BPR", "general.bpr", "BPR", _G, "GeneralGraphDataset")
_reg("NeuMF", "general.neumf", "NeuMF", _G, "GeneralGraphDataset")
_reg("GRU4Rec", "sequential.gru4rec", "GRU4Rec", _S, "SequentialDataset")
_reg("NARM", "sequential.narm", "NARM", _S, "SequentialDataset")
_reg("SASRec", "sequential.sasrec", "SASRec", _S, "SequentialDataset")


def model_info(name: str) -> ModelInfo:
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; known: "
            f"{sorted(i.name for i in _REGISTRY.values())}")
    return _REGISTRY[key]


def get_model(name: str):
    info = model_info(name)
    mod = importlib.import_module(f"recbole_gnn_tpu.models.{info.module}")
    return getattr(mod, info.class_name)


def get_dataset_class(name: str):
    from recbole_gnn_tpu.data import dataset as dataset_mod
    info = model_info(name)
    # explicit <Model>Dataset override hook (reference utils.py:30-33)
    override = getattr(dataset_mod, f"{info.name}Dataset", None)
    if override is not None and info.dataset_class == f"{info.name}Dataset":
        return override
    return getattr(dataset_mod, info.dataset_class)


def all_model_names() -> list[str]:
    return sorted(i.name for i in _REGISTRY.values())
