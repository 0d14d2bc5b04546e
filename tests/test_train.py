"""Trainer-level tests: checkpoint round-trip, resume, early stopping,
hyper-tuning grid, config cascade."""

import numpy as np
import pytest

from conftest import base_config_dict

from recbole_gnn_tpu.config import Config
from recbole_gnn_tpu.train.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    state = {
        "params": {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
                   "nested": {"b": jnp.ones((4,))}},
        "opt_state": {"m": {"a": jnp.zeros((2, 3))}, "t": jnp.int32(7)},
        "extras": {"list": [jnp.ones((2,)), jnp.zeros((3,))],
                   "tuple": (jnp.ones((1,)),)},
        "epoch": np.int64(5),
    }
    path = str(tmp_path / "ck.pth")
    save_checkpoint(path, state)
    loaded = load_checkpoint(path)
    np.testing.assert_array_equal(loaded["params"]["a"],
                                  np.arange(6).reshape(2, 3))
    np.testing.assert_array_equal(loaded["params"]["nested"]["b"], np.ones(4))
    assert int(loaded["opt_state"]["t"]) == 7
    assert isinstance(loaded["extras"]["list"], list)
    assert isinstance(loaded["extras"]["tuple"], tuple)
    assert int(loaded["epoch"]) == 5


def test_fit_saves_and_restores_best(tmp_path):
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
    res = run_recbole_gnn_tpu(
        model="BPR", dataset="test",
        config_dict=base_config_dict(
            model="BPR", epochs=2, checkpoint_dir=str(tmp_path)),
        saved=True, verbose=False)
    assert (tmp_path / "BPR-test.ckpt").exists()
    assert res["test_result"]["recall@10"] >= 0.0


def test_resume_from_checkpoint(tmp_path):
    import jax
    from recbole_gnn_tpu.quick_start import (
        create_dataset, data_preparation)
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.train.trainer import Trainer

    cfg = Config(config_dict=base_config_dict(
        model="BPR", epochs=1, checkpoint_dir=str(tmp_path)))
    ds = create_dataset(cfg)
    (tl, tr_ds), (vl, _), _ = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, tr_ds)
    trainer = Trainer(cfg, model)
    trainer.fit(tl, vl, saved=True, verbose=False)
    t2 = Trainer(cfg, model)
    epoch = t2.resume_from_checkpoint()
    assert epoch >= 0
    np.testing.assert_array_equal(
        np.asarray(t2.params["user_emb"]),
        np.asarray(trainer.params["user_emb"]))


def test_resume_into_fit_bit_matches_straight_run(tmp_path):
    """Preemption recovery: train 2 epochs + checkpoint, then resume and
    train 2 more — params must bit-match an uninterrupted 4-epoch run
    (the per-epoch fold_in schedule and loader shuffle stream realign)."""
    from recbole_gnn_tpu.quick_start import (
        create_dataset, data_preparation)
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.train.trainer import Trainer

    def make(epochs, ckdir):
        cfg = Config(config_dict=base_config_dict(
            model="LightGCN", epochs=epochs, checkpoint_dir=ckdir))
        ds = create_dataset(cfg)
        (tl, tr_ds), _, _ = data_preparation(cfg, ds)
        model = get_model("LightGCN")(cfg, tr_ds)
        return cfg, tl, model

    # uninterrupted 4-epoch run
    _, tl, model = make(4, str(tmp_path / "a"))
    cfg4 = Config(config_dict=base_config_dict(
        model="LightGCN", epochs=4, checkpoint_dir=str(tmp_path / "a")))
    straight = Trainer(cfg4, model)
    straight.fit(tl, saved=False, verbose=False)

    # interrupted: 2 epochs, checkpoint, new trainer resumes 2 more
    cfg2, tl2, model2 = make(2, str(tmp_path / "b"))
    t1 = Trainer(cfg2, model2)
    t1.fit(tl2, saved=True, verbose=False)
    cfg4b = Config(config_dict=base_config_dict(
        model="LightGCN", epochs=4, checkpoint_dir=str(tmp_path / "b")))
    _, tl3, _ = make(4, str(tmp_path / "b"))
    t2 = Trainer(cfg4b, model2)
    t2.fit(tl3, saved=False, verbose=False, resume=True)

    for k in straight.params:
        np.testing.assert_array_equal(np.asarray(straight.params[k]),
                                      np.asarray(t2.params[k]), err_msg=k)


def test_resume_restores_best_score_no_overwrite(tmp_path):
    """ADVICE r2 (medium): a resumed fit must restore best_score from
    the checkpoint so a WORSE post-resume validation cannot overwrite a
    better saved model.  Simulated by resuming with a huge restored
    best: no epoch can beat it, so the checkpoint file must stay
    byte-identical through the resumed fit."""
    from recbole_gnn_tpu.quick_start import (
        create_dataset, data_preparation)
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint)
    from recbole_gnn_tpu.train.trainer import Trainer

    cfg = Config(config_dict=base_config_dict(
        model="BPR", epochs=2, checkpoint_dir=str(tmp_path)))
    ds = create_dataset(cfg)
    (tl, tr_ds), (vl, _), _ = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, tr_ds)
    t1 = Trainer(cfg, model)
    t1.fit(tl, vl, saved=True, verbose=False)
    ckpt_path = t1.saved_model_file
    state = load_checkpoint(ckpt_path)
    assert np.isfinite(float(state["best_score"]))  # persisted
    # forge an unbeatable pre-resume best
    state["best_score"] = np.float64(1e9)
    save_checkpoint(ckpt_path, state)
    before = open(ckpt_path, "rb").read()

    cfg2 = Config(config_dict=base_config_dict(
        model="BPR", epochs=4, checkpoint_dir=str(tmp_path)))
    t2 = Trainer(cfg2, model)
    best, _ = t2.fit(tl, vl, saved=True, verbose=False, resume=True)
    assert best == 1e9                       # pre-resume best retained
    assert open(ckpt_path, "rb").read() == before  # never overwritten


def test_evaluate_before_fit_raises(tmp_path):
    from recbole_gnn_tpu.quick_start import (
        create_dataset, data_preparation)
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.train.trainer import Trainer

    cfg = Config(config_dict=base_config_dict(
        model="BPR", checkpoint_dir=str(tmp_path / "empty")))
    ds = create_dataset(cfg)
    _, (vl, _), _ = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, ds)
    trainer = Trainer(cfg, model)
    with pytest.raises(RuntimeError, match="before fit"):
        trainer.evaluate(vl)


def test_hyper_tuning_grid(tmp_path):
    from recbole_gnn_tpu.hyper import HyperTuning

    space = {"embedding_size": [8, 16]}
    hp = HyperTuning(space=space,
                     fixed_config_dict=base_config_dict(model="BPR"))
    best_params, best_result = hp.run()
    assert best_params["embedding_size"] in (8, 16)
    assert len(hp.params2result) == 2
    out = tmp_path / "hyper.txt"
    hp.export_result(str(out))
    assert out.read_text().count("Test result") == 2


def test_hyper_tuning_random(tmp_path):
    from recbole_gnn_tpu.hyper import HyperTuning, parse_params_file_raw

    pf = tmp_path / "params.hyper"
    pf.write_text("embedding_size choice [8,16]\n"
                  "learning_rate loguniform [1e-4, 1e-2]\n")
    raw = parse_params_file_raw(str(pf))
    assert raw["embedding_size"] == ("choice", [8, 16])
    assert raw["learning_rate"][0] == "loguniform"

    hp = HyperTuning(params_file=str(pf), algo="random", max_evals=2,
                     fixed_config_dict=base_config_dict(model="BPR"))
    best_params, best_result = hp.run()
    assert len(hp.params2result) == 2
    assert best_params["embedding_size"] in (8, 16)
    assert 1e-4 <= best_params["learning_rate"] <= 1e-2
    # seeded: a second instance draws the identical parameter sets
    hp2 = HyperTuning(params_file=str(pf), algo="random", max_evals=2,
                      fixed_config_dict=base_config_dict(model="BPR"))
    assert [str(p) for p in hp2._iter_param_sets()] == \
        list(hp.params2result.keys())


def test_resume_config_key_and_fresh_start(tmp_path):
    """config['resume'] (run.py --resume) plumbs into fit(); with no
    checkpoint on disk it starts fresh instead of raising."""
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu

    cfg = base_config_dict(model="BPR", epochs=1, resume=True,
                           checkpoint_dir=str(tmp_path))
    res = run_recbole_gnn_tpu(config_dict=cfg, saved=True, verbose=False)
    assert "test_result" in res
    # second run resumes from the just-written checkpoint (epoch 0) and
    # must complete without error
    cfg2 = base_config_dict(model="BPR", epochs=2, resume=True,
                            checkpoint_dir=str(tmp_path))
    res2 = run_recbole_gnn_tpu(config_dict=cfg2, saved=True, verbose=False)
    assert "test_result" in res2


def test_tensorboard_hparams_export(tmp_path):
    """fit() exports hparams + best valid metrics to TB at the end
    ([recbole] _add_hparam_to_tensorboard analog)."""
    import os
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu

    tb = tmp_path / "tb"
    cfg = base_config_dict(model="BPR", epochs=1,
                           tensorboard_dir=str(tb),
                           checkpoint_dir=str(tmp_path))
    run_recbole_gnn_tpu(config_dict=cfg, saved=False, verbose=False)
    files = [os.path.join(r, f) for r, _, fs in os.walk(tb) for f in fs]
    assert files, "no tensorboard event files written"
    # add_hparams writes a sub-run directory with its own event file
    assert any(os.path.dirname(f) != str(tb) for f in files), \
        "no hparams sub-run found"


def test_hyper_tuning_bayes(tmp_path):
    """TPE-style algo: respects the budget, explores startup randomly,
    then proposes from the good/bad density ratio (VERDICT r3 #8)."""
    from recbole_gnn_tpu.hyper import HyperTuning

    pf = tmp_path / "params.hyper"
    pf.write_text("embedding_size choice [8,16]\n"
                  "learning_rate loguniform [1e-4, 1e-2]\n")
    hp = HyperTuning(params_file=str(pf), algo="bayes", max_evals=7,
                     fixed_config_dict=base_config_dict(model="BPR"))
    best_params, best_result = hp.run()
    assert len(hp.params2result) == 7      # budget exactly consumed
    assert best_params["embedding_size"] in (8, 16)
    assert 1e-4 <= best_params["learning_rate"] <= 1e-2
    assert best_result["best_valid_score"] == hp.best_score
    # the TPE ratio itself: candidates near the good cluster must score
    # above candidates near the bad cluster
    good = [{"learning_rate": 1e-3, "embedding_size": 16}] * 3
    bad = [{"learning_rate": 1e-4, "embedding_size": 8}] * 3
    near_good = {"learning_rate": 1.1e-3, "embedding_size": 16}
    near_bad = {"learning_rate": 1.1e-4, "embedding_size": 8}
    assert (hp._tpe_logratio(near_good, good, bad)
            > hp._tpe_logratio(near_bad, good, bad))


def test_hyper_tuning_bayes_tiny_discrete_space_terminates(tmp_path):
    """All-discrete space with fewer unique combos than the startup
    budget must still terminate (duplicate draws get accepted after a
    bounded retry, not looped on forever)."""
    from recbole_gnn_tpu.hyper import HyperTuning

    pf = tmp_path / "params.hyper"
    pf.write_text("learning_rate choice [0.01,0.001]\n")  # 2 combos < 5
    hp = HyperTuning(params_file=str(pf), algo="bayes", max_evals=4,
                     fixed_config_dict=base_config_dict(model="BPR"))
    hp.run()
    assert len(hp.params2result) >= 2      # both combos seen, no hang


def test_config_cascade_precedence(tmp_path):
    # model yaml < user file < config dict
    f = tmp_path / "user.yaml"
    f.write_text("embedding_size: 32\nn_layers: 5\n")
    cfg = Config(model="LightGCN", dataset="test",
                 config_file_list=[str(f)],
                 config_dict={"n_layers": 7})
    assert cfg["embedding_size"] == 32      # file overrides model yaml (64)
    assert cfg["n_layers"] == 7             # dict overrides file
    assert cfg["reg_weight"] == 1e-05       # model yaml survives


def test_config_sequential_base_applied():
    cfg = Config(model="SRGNN", dataset="test")
    assert cfg["train_neg_sample_args"] is None
    assert cfg["eval_args"]["split"] == {"LS": "valid_and_test"}
    assert cfg["eval_args"]["order"] == "TO"


def test_config_cli_parsing():
    from recbole_gnn_tpu.config.config import parse_cli
    out = parse_cli(["--learning_rate=1e-4", "--topk=[5,10]",
                     "--enable_sparse=True"])
    assert out["learning_rate"] == 1e-4
    assert out["topk"] == [5, 10]
    assert out["enable_sparse"] is True


def test_unknown_model_raises():
    with pytest.raises(ValueError, match="unknown model"):
        Config(model="NotAModel", dataset="test")


def test_extras_checkpointed_and_restored(tmp_path):
    """Models with rich extras (NCL centroids) save/restore them through
    the best-model checkpoint (other_parameter_name parity)."""
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
    from recbole_gnn_tpu.train.checkpoint import load_checkpoint
    run_recbole_gnn_tpu(
        model="NCL", dataset="test",
        config_dict=base_config_dict(
            model="NCL", num_clusters=8, warm_up_step=0, epochs=1,
            checkpoint_dir=str(tmp_path)),
        saved=True, verbose=False)
    state = load_checkpoint(str(tmp_path / "NCL-test.ckpt"))
    assert "user_centroids" in state["extras"]
    assert state["extras"]["user_centroids"].shape[0] == 8


def test_epoch_scan_matches_per_step():
    """Whole-epoch scan, chunked scan (K steps/dispatch incl. a ragged
    final chunk), and per-step dispatch must be numerically identical
    (global step_idx keeps the fold_in schedule aligned)."""
    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu
    results = []
    for scan in (True, 3, False):
        res = run_recbole_gnn_tpu(
            model="LightGCN", dataset="test",
            config_dict=base_config_dict(model="LightGCN", epochs=2,
                                         epoch_scan=scan),
            saved=False, verbose=False)
        results.append(res["test_result"])
    for k in results[0]:
        np.testing.assert_allclose(results[0][k], results[1][k],
                                   rtol=1e-5, atol=1e-7, err_msg=f"chunked {k}")
        np.testing.assert_allclose(results[0][k], results[2][k],
                                   rtol=1e-5, atol=1e-7, err_msg=f"per-step {k}")


def test_stopping_min_epochs_floor():
    """Early stopping must not fire before stopping_min_epochs even
    when the patience window is exhausted (round-5 knob; the XSimGCL
    valid-dip artifact in results/synth_quality.md)."""
    from recbole_gnn_tpu.quick_start import (
        create_dataset, data_preparation)
    from recbole_gnn_tpu.config import Config
    from recbole_gnn_tpu.models import get_model
    from recbole_gnn_tpu.train.trainer import Trainer
    from conftest import base_config_dict

    def run(min_ep):
        cfg = Config(config_dict=base_config_dict(
            model="LightGCN", epochs=12, seed=2020,
            stopping_step=1, stopping_min_epochs=min_ep,
            # a huge lr makes the valid metric non-improving fast
            learning_rate=10.0))
        ds = create_dataset(cfg)
        (tr, tr_ds), (va, _), _ = data_preparation(cfg, ds)
        t = Trainer(cfg, get_model("LightGCN")(cfg, tr_ds))
        t.fit(tr, va, saved=False, verbose=False)
        return len(t.train_timings)

    short = run(0)
    floored = run(8)
    assert floored >= 8, floored
    assert short < 8, short   # sanity: without the floor it stops early
