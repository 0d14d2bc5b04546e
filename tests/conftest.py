"""Test env: CPU backend with 8 virtual devices so sharding logic is
CI-testable without a TPU pod (SURVEY.md §4 "Implication").

The environment pins JAX_PLATFORMS=axon (TPU tunnel); running the test
sweep over the tunnel is slow and serializes on the single chip, so we
force the CPU backend *after* import (the axon plugin re-forces
jax_platforms at registration time, which happens in sitecustomize
before conftest runs — a plain env var is overridden, a post-import
config update sticks).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

TEST_DATA = os.path.join(os.path.dirname(__file__), "test_data")


@pytest.fixture(scope="session")
def test_data_path():
    return TEST_DATA


def base_config_dict(**over):
    cfg = {
        "dataset": "test",
        "data_path": TEST_DATA,
        "epochs": 1,
        "state": "ERROR",
        "train_batch_size": 512,
        "eval_batch_size": 256,
        "checkpoint_dir": "/tmp/rgt_test_saved",
        "MAX_ITEM_LIST_LENGTH": 20,
    }
    cfg.update(over)
    return cfg
