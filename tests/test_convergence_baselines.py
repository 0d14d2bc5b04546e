"""Fixture-convergence regression gate (VERDICT r1 #7).

results/fixture_convergence.json records the seeded 3-epoch test
metrics of all 25 models on the 6k fixture
(scripts/gen_convergence_baselines.py).  This test re-runs one model
per family + one contrastive model and asserts the metrics land inside
a tolerance band — quality regressions (a broken loss, a silently
changed normalization) become visible between rounds even though the
public benchmark datasets can't be downloaded here.

Band: same platform + seed is deterministic in principle; the band
absorbs cross-version numeric drift, not behavior changes.
"""

import json
import os

import numpy as np
import pytest

from conftest import base_config_dict

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "..",
                             "results", "fixture_convergence.json")

SUBSET = ["LightGCN", "SGL", "SRGNN", "MHCN"]


@pytest.fixture(scope="module")
def baselines():
    with open(BASELINE_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("model", SUBSET)
def test_convergence_matches_baseline(model, baselines):
    from recbole_gnn_tpu.quick_start import objective_function

    rec = baselines["models"][model]
    over = {}
    if model == "NCL":
        over = {"num_clusters": 8, "warm_up_step": 0, "m_step": 1}
    res = objective_function(
        config_dict=base_config_dict(
            model=model, epochs=baselines["epochs"],
            seed=baselines["seed"], **over),
        saved=False)
    for metric in ("recall@10", "ndcg@10", "mrr@10"):
        want = rec["test_result"][metric]
        got = float(res["test_result"][metric])
        tol = max(0.01, 0.15 * abs(want))
        assert abs(got - want) <= tol, (
            f"{model} {metric}: got {got:.4f}, baseline {want:.4f} "
            f"(band ±{tol:.4f}) — quality regression? If the change is "
            f"intentional, regenerate with "
            f"scripts/gen_convergence_baselines.py")


LONG_PATH = os.path.join(os.path.dirname(__file__), "..",
                         "results", "fixture_convergence_long.json")

CONTRASTIVE = ["SimGCL", "XSimGCL", "SGL", "NCL"]


@pytest.fixture(scope="module")
def long_baselines():
    with open(LONG_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("model", CONTRASTIVE)
def test_contrastive_long_horizon(model, long_baselines):
    """VERDICT r2 #5: the contrastive family gated at 15 epochs with a
    TIGHT band.  On this fixture the CL losses dominate the outcome
    (SimGCL recall 0.007 vs LightGCN's 0.17 at the same horizon — the
    InfoNCE term is what produces that gap), so any CL-loss regression
    moves the metric far outside the ±max(0.002, 10%) band in either
    direction.  Regenerate with scripts/gen_convergence_long.py."""
    from recbole_gnn_tpu.quick_start import objective_function

    rec = long_baselines["models"][model]
    over = {}
    if model == "NCL":
        over = {"num_clusters": 8, "warm_up_step": 0, "m_step": 1}
    res = objective_function(
        config_dict=base_config_dict(
            model=model, epochs=long_baselines["epochs"],
            seed=long_baselines["seed"], **over),
        saved=False)
    for metric in ("recall@10", "ndcg@10", "mrr@10"):
        want = rec["test_result"][metric]
        got = float(res["test_result"][metric])
        tol = max(0.002, 0.10 * abs(want))
        assert abs(got - want) <= tol, (
            f"{model} {metric} @15ep: got {got:.4f}, baseline {want:.4f} "
            f"(band ±{tol:.4f}) — contrastive-loss regression? If "
            f"intentional, regenerate with scripts/gen_convergence_long.py")


def test_baseline_file_covers_all_models(baselines):
    from recbole_gnn_tpu.models import all_model_names
    missing = set(all_model_names()) - set(baselines["models"])
    assert not missing, f"baselines missing: {sorted(missing)}"
