"""Quick-start pipeline: config → data → model → train → eval.

Equivalent of the reference's quick_start.py:9-96 (`run_recbole_gnn`,
`objective_function`) and the factory functions in its utils.py
(create_dataset / data_preparation / get_model / get_trainer).
"""

from __future__ import annotations

from recbole_gnn_tpu.config import Config
from recbole_gnn_tpu.data.loader import (
    FullSortEvalLoader,
    NegSampleEvalLoader,
    SequentialFullSortEvalLoader,
    SequentialNegSampleEvalLoader,
    SequentialTrainLoader,
    TrainLoader,
)
from recbole_gnn_tpu.models import get_dataset_class, get_model
from recbole_gnn_tpu.train.trainer import get_trainer
from recbole_gnn_tpu.utils.enums import ModelType
from recbole_gnn_tpu.utils.logging import init_logger
from recbole_gnn_tpu.utils.seed import init_seed


_DATASET_CACHE_KEYS = (
    "dataset", "data_path", "load_col", "val_interval",
    "user_inter_num_interval", "item_inter_num_interval", "seed",
    "repeatable", "MAX_ITEM_LIST_LENGTH", "filter_net_by_inter",
    "undirected_net",
)

# bump when the pickled dataset/split schema changes (a stale cache
# would otherwise feed models arrays they no longer expect) —
# r4: LESSR eop_mail/eop_mail_cnt added to session_graphs
_DATASET_SCHEMA_VERSION = 2


def create_dataset(config):
    """Resolve + build the dataset for config['model'] (precedence
    mirrors reference utils.py:30-39).

    Tier-2 cache (reference utils.py:41-54): with ``save_dataset`` the
    processed dataset pickles to
    {checkpoint_dir}/{dataset}-{Class}.pth and reloads only when every
    cache-relevant config value matches."""
    prec = config["pallas_spmm_precision"]
    if prec:
        # runtime knob for the streaming SpMM stream format (packed /
        # f32x2 / bf16) — a module default, since Graphs don't carry
        # config through jit
        if str(prec) not in ("packed", "f32x2", "bf16"):
            raise ValueError(
                f"pallas_spmm_precision must be packed/f32x2/bf16, "
                f"got {prec!r}")
        from recbole_gnn_tpu.ops import pallas_spmm as _ps
        _ps.DEFAULT_PRECISION = str(prec)
    impl = config["sparse_spmm_impl"]
    if impl:
        if str(impl) not in ("ell", "xla", "pallas"):
            raise ValueError(
                f"sparse_spmm_impl must be 'ell', 'xla' or 'pallas', "
                f"got {impl!r}")
        from recbole_gnn_tpu.ops import spmm as _spmm_mod
        _spmm_mod.SPMM_IMPL = str(impl)
    import os
    import pickle

    cls = get_dataset_class(config["model"])
    path = os.path.join(config["checkpoint_dir"] or "saved/",
                        f"{config['dataset']}-{cls.__name__}.pth")
    want_key = {k: config[k] for k in _DATASET_CACHE_KEYS}
    want_key["__schema__"] = _DATASET_SCHEMA_VERSION
    if config["save_dataset"] and os.path.isfile(path):
        try:
            with open(path, "rb") as f:
                blob = pickle.load(f)
            if blob.get("key") == want_key:
                ds = blob["dataset"]
                ds.config = config
                return ds
        except Exception:
            pass
    ds = cls(config)
    if config["save_dataset"]:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cfg_ref, ds.config = ds.config, None  # configs aren't picklable-stable
        tmp = f"{path}.tmp.{os.getpid()}"   # atomic: multi-host ranks
        with open(tmp, "wb") as f:          # share the checkpoint dir
            pickle.dump({"key": want_key, "dataset": ds}, f)
        os.replace(tmp, path)
        ds.config = cfg_ref
    return ds


def _parse_eval_mode(config) -> tuple[str, int]:
    """'full' | 'uniN' | 'popN' → (mode, sample_num) — the three
    candidate regimes of the [recbole] evaluator the reference
    inherits (uniform / popularity-sampled negatives)."""
    mode = ((config["eval_args"] or {}).get("mode")) or "full"
    if mode == "full":
        return "full", 0
    if mode.startswith("uni"):
        return "uni", int(mode[3:])
    if mode.startswith("pop"):
        return "pop", int(mode[3:])
    raise ValueError(f"unsupported eval mode {mode!r}")


def data_preparation(config, dataset):
    """Split + wrap in loaders → (train_data, valid_data, test_data).

    Each element is (loader, split_dataset); the model consumes the
    *train* split dataset for graph construction, matching the
    reference's `get_model(...)(config, train_data.dataset)`.

    Tier-3 cache (reference utils.py:115-127 save/load_split_dataloaders):
    with ``save_dataloaders`` the three built splits — including the
    precomputed session-graph arrays — pickle alongside the dataset
    cache and reload when the cache key matches."""
    train_ds = valid_ds = test_ds = None
    cache_path = None
    if config["save_dataloaders"]:
        import os
        import pickle
        cls_name = type(dataset).__name__
        cache_path = os.path.join(
            config["checkpoint_dir"] or "saved/",
            f"{config['dataset']}-{cls_name}-splits.pth")
        want_key = {k: config[k] for k in _DATASET_CACHE_KEYS}
        want_key["__schema__"] = _DATASET_SCHEMA_VERSION
        want_key["eval_args"] = config["eval_args"]
        if os.path.isfile(cache_path):
            try:
                with open(cache_path, "rb") as f:
                    blob = pickle.load(f)
                if blob.get("key") == want_key:
                    train_ds, valid_ds, test_ds = blob["splits"]
                    for ds_ in (train_ds, valid_ds, test_ds):
                        ds_.config = config
            except Exception:
                train_ds = None
    if train_ds is None:
        train_ds, valid_ds, test_ds = dataset.build()
        if cache_path is not None:
            import os
            import pickle
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            cfgs = [s.config for s in (train_ds, valid_ds, test_ds)]
            for s in (train_ds, valid_ds, test_ds):
                s.config = None
            tmp = f"{cache_path}.tmp.{os.getpid()}"   # atomic (multi-host)
            with open(tmp, "wb") as f:
                pickle.dump({"key": want_key,
                             "splits": (train_ds, valid_ds, test_ds)}, f)
            os.replace(tmp, cache_path)
            for s, c in zip((train_ds, valid_ds, test_ds), cfgs):
                s.config = c
    is_seq = config["MODEL_TYPE"] == ModelType.SEQUENTIAL
    mode, sample_num = _parse_eval_mode(config)

    if is_seq:
        train_loader = SequentialTrainLoader(train_ds, config)
        if mode == "full":
            valid_loader = SequentialFullSortEvalLoader(valid_ds, config)
            test_loader = SequentialFullSortEvalLoader(test_ds, config)
        else:
            valid_loader = SequentialNegSampleEvalLoader(
                valid_ds, [train_ds], config, sample_num,
                distribution=mode)
            test_loader = SequentialNegSampleEvalLoader(
                test_ds, [train_ds, valid_ds], config, sample_num,
                distribution=mode)
    else:
        train_loader = TrainLoader(train_ds, config)
        if mode == "full":
            valid_loader = FullSortEvalLoader(valid_ds, [train_ds], config)
            test_loader = FullSortEvalLoader(
                test_ds, [train_ds, valid_ds], config)
        else:
            valid_loader = NegSampleEvalLoader(
                valid_ds, [train_ds], config, sample_num,
                distribution=mode)
            test_loader = NegSampleEvalLoader(
                test_ds, [train_ds, valid_ds], config, sample_num,
                distribution=mode)
    return (train_loader, train_ds), (valid_loader, valid_ds), \
        (test_loader, test_ds)


def apply_backend_config(config) -> None:
    """Honor ``use_gpu=False`` ([recbole] key) by forcing the CPU
    backend.  Must be a post-import config update: the axon
    sitecustomize re-pins JAX_PLATFORMS at registration, so the env
    var alone is silently ignored.  Safe to call repeatedly; a no-op
    once the backend is initialized (e.g. under pytest)."""
    if config["use_gpu"] is False:
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass   # backend already initialized


def run_recbole_gnn_tpu(model=None, dataset=None, config_file_list=None,
                        config_dict=None, saved=True, verbose=True):
    """End-to-end train + eval (reference quick_start.py:9-63)."""
    config = Config(model=model, dataset=dataset,
                    config_file_list=config_file_list,
                    config_dict=config_dict)
    apply_backend_config(config)
    init_seed(int(config.get("seed", 2020)), bool(config["reproducibility"]))
    logger = init_logger(config)
    if verbose:
        logger.info(str(config))

    import time as _time
    t0 = _time.time()
    ds = create_dataset(config)
    if verbose:
        logger.info(str(ds))
        logger.info(f"dataset ready [{_time.time() - t0:.1f}s]")
    (train_loader, train_ds), (valid_loader, _), (test_loader, _) = \
        data_preparation(config, ds)
    if verbose:
        logger.info(f"loaders ready [{_time.time() - t0:.1f}s]")

    init_seed(int(config.get("seed", 2020)), bool(config["reproducibility"]))
    model_cls = get_model(config["model"])
    model_obj = model_cls(config, train_ds)
    trainer = get_trainer(config["MODEL_TYPE"], config["model"])(
        config, model_obj)
    if verbose:
        logger.info(
            f"model + graph consts built [{_time.time() - t0:.1f}s]")

    best_valid_score, best_valid_result = trainer.fit(
        train_loader, valid_loader, saved=saved, verbose=verbose,
        resume=bool(config["resume"]))
    test_result = trainer.evaluate(test_loader, load_best_model=saved)
    if verbose:
        logger.info(f"best valid : {best_valid_result}")
        logger.info(f"test result: {test_result}")

    return {
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"] is not False,
        "best_valid_result": best_valid_result,
        "test_result": test_result,
    }


def objective_function(config_dict=None, config_file_list=None, saved=True):
    """Quiet pipeline for hyper-tuning (reference quick_start.py:66-96)."""
    config_dict = dict(config_dict or {})
    config_dict.setdefault("state", "ERROR")
    return run_recbole_gnn_tpu(
        config_file_list=config_file_list, config_dict=config_dict,
        saved=saved, verbose=False)
