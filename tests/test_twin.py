"""End-to-end quality-parity gate: torch twin vs this framework.

The twin (scripts/twin/torch_models.py) replicates the REFERENCE's
training semantics (model forward + loss + init family + torch Adam)
and consumes THIS framework's config/dataset/loaders, so splits, batch
composition, negatives and metric code are identical — the remaining
difference is exactly the thing being verified.  Full 5-model results:
results/fixture_twin.md (VERDICT r3 next-round #2).

This gate trains the strongest-signal pair (LightGCN, 15 fixture
epochs, seed 2020) both ways and asserts the final NDCG@10/Recall@10
agree within a band that is tight relative to the failure mode it
guards (a sign/scale bug shows up as ≥5×, e.g. a broken model sits at
~0.01 vs ~0.11).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

from conftest import base_config_dict  # noqa: E402

torch = pytest.importorskip("torch")


def test_lightgcn_twin_band():
    from twin.run_twin import train_framework, train_twin

    epochs = 15
    curve = train_twin("LightGCN", epochs)
    twin = curve[-1]
    ours = train_framework("LightGCN", epochs)
    # band: generous to cross-framework init/seed noise (~±20% observed),
    # far below the ≥5× signal of a real semantics bug
    for key in ("ndcg@10", "recall@10"):
        t, o = twin[key], ours[key]
        assert t > 0 and o > 0
        ratio = o / t
        assert 0.55 < ratio < 1.8, (
            f"{key}: ours={o:.4f} vs twin={t:.4f} (ratio {ratio:.2f}) — "
            "framework diverged from reference training semantics")
    # the twin must also have LEARNED (guards the harness itself):
    # untrained LightGCN on the fixture scores ndcg@10 < 0.02
    assert twin["ndcg@10"] > 0.05


def test_twin_uses_identical_batches():
    """The twin consumes this framework's loaders: same split sizes,
    same first-batch content under the same seed."""
    from twin.run_twin import _framework_pipeline

    _, splits = _framework_pipeline("LightGCN", 1)
    (train_loader, train_ds), _, (test_loader, _) = splits
    b1 = next(iter(train_loader))
    train_loader.epoch = 0  # rewind the per-epoch reshuffle seed
    b2 = next(iter(train_loader))
    np.testing.assert_array_equal(b1["user_id"], b2["user_id"])
    np.testing.assert_array_equal(b1["neg_item_id"], b2["neg_item_id"])
    assert train_ds.n_users > 0 and len(test_loader) > 0
