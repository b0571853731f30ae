"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the pattern the reference uses for
replica-logic testing via mocks, reference:
tests/data/nn/parquet/partitioning/test_partitioning.py:92-132).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os
import sys
from pathlib import Path

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so env vars alone are too late here — the config
# update below is what actually forces the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def simple_interactions() -> pd.DataFrame:
    """Small interaction log with ratings and timestamps."""
    return pd.DataFrame(
        {
            "user_id": [0, 0, 0, 1, 1, 2, 2, 2, 3, 3],
            "item_id": [0, 1, 2, 0, 2, 3, 1, 2, 0, 3],
            "rating": [1.0, 2.0, 3.0, 4.0, 5.0, 1.0, 2.0, 3.0, 4.0, 5.0],
            "timestamp": pd.to_datetime(
                [
                    "2024-01-01",
                    "2024-01-02",
                    "2024-01-03",
                    "2024-01-01",
                    "2024-01-04",
                    "2024-01-02",
                    "2024-01-03",
                    "2024-01-05",
                    "2024-01-01",
                    "2024-01-06",
                ]
            ),
        }
    )


@pytest.fixture()
def raw_interactions() -> pd.DataFrame:
    """Unencoded string-id interactions."""
    return pd.DataFrame(
        {
            "user_id": ["u1", "u1", "u2", "u2", "u3"],
            "item_id": ["i1", "i2", "i1", "i3", "i2"],
            "rating": [1.0, 2.0, 3.0, 4.0, 5.0],
            "timestamp": np.arange(5),
        }
    )
