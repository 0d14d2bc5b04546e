"""Structured-signal smoke gates (round 5).

The 6k committed fixture is random, so a quality regression that
preserves "runs without crashing" is invisible to the smoke sweep.
These gates generate TINY versions of the round-5 structured synthetic
datasets (scripts/synth_study/gen_synth.py — planted CF / Markov
signal) and assert the flagship models actually LEARN: NDCG several
multiples above the random floor within a few epochs.

Full-scale study (25 models, tuned recipes, torch twins):
results/synth_quality.md.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "synth_study"))

from conftest import base_config_dict  # noqa: E402
from recbole_gnn_tpu.quick_start import objective_function  # noqa: E402


@pytest.fixture(scope="module")
def synth_dirs(tmp_path_factory):
    from gen_synth import generate, generate_sessions
    root = str(tmp_path_factory.mktemp("synth_smoke"))
    generate(os.path.join(root, "synth"), n_users=250, n_items=500,
             mean_len=40, seed=11)
    generate_sessions(os.path.join(root, "synthseq"), n_sessions=4000,
                      n_items=600, seed=12)
    return root


def test_lightgcn_learns_cf_structure(synth_dirs):
    """Random top-10 over ~500 items ≈ 0.02 recall; planted low-rank
    CF must put LightGCN far above that within 8 epochs."""
    cfg = base_config_dict(
        model="LightGCN", dataset="synth", data_path=synth_dirs,
        epochs=8, seed=2020, train_batch_size=2048,
        learning_rate=0.002)
    res = objective_function(config_dict=cfg, saved=False)
    assert res["test_result"]["ndcg@10"] > 0.05, res["test_result"]


def test_srgnn_learns_markov_structure(synth_dirs):
    """Planted first-order transitions must lift SRGNN well above the
    random floor (ndcg ~0.008 at 10/600) within 4 epochs — measured
    headroom: 0.072 at 3 epochs, so 0.05 is ~6x floor with margin."""
    cfg = base_config_dict(
        model="SRGNN", dataset="synthseq", data_path=synth_dirs,
        epochs=4, seed=2020, train_batch_size=2048)
    res = objective_function(config_dict=cfg, saved=False)
    assert res["test_result"]["ndcg@10"] > 0.05, res["test_result"]
