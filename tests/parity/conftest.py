"""Differential-parity tests: run the REFERENCE implementation (pandas
backend, /root/reference) next to replay_tpu on identical random inputs and
assert equal outputs.

The reference imports polars unconditionally; a minimal stub satisfies its
isinstance checks without installing polars.  These tests are skipped when
the reference checkout is absent (e.g. external CI).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

REFERENCE = Path("/root/reference")


def _install_polars_stub():
    if "polars" in sys.modules:
        return
    import importlib.machinery

    fake = types.ModuleType("polars")
    # a spec-less module breaks importlib.util.find_spec("polars") — which
    # replay_tpu.utils.types runs at import time to set POLARS_AVAILABLE
    fake.__spec__ = importlib.machinery.ModuleSpec("polars", None)

    class _FakeDF:
        pass

    fake.DataFrame = _FakeDF
    fake.Series = _FakeDF
    fake.Expr = _FakeDF
    fake.LazyFrame = type("LazyFrame", (), {})
    fake.col = lambda *a, **k: None
    fake.read_parquet = lambda *a, **k: None
    sys.modules["polars"] = fake


def _install_lightning_stub():
    """Minimal lightning so the reference's pure-torch model modules import
    (their package __init__ defines LightningModule subclasses; the torch
    models themselves never touch lightning)."""
    if "lightning" in sys.modules:
        return
    import importlib.machinery

    import torch

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        return m

    fake = _mod("lightning")

    class LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

    class LightningDataModule:
        pass

    class Trainer:
        def __init__(self, *a, **k):
            pass

    fake.LightningModule = LightningModule
    fake.LightningDataModule = LightningDataModule
    fake.Trainer = Trainer
    fake.Callback = type("Callback", (), {})
    pytorch = _mod("lightning.pytorch")
    utilities = _mod("lightning.pytorch.utilities")
    rank_zero = _mod("lightning.pytorch.utilities.rank_zero")
    rank_zero.rank_zero_only = lambda fn: fn
    utilities.rank_zero = rank_zero
    utilities.CombinedLoader = type("CombinedLoader", (), {})
    utilities.move_data_to_device = lambda batch, device: batch
    trainer_mod = _mod("lightning.pytorch.trainer")
    states = _mod("lightning.pytorch.trainer.states")

    class RunningStage:
        TRAINING = "train"
        VALIDATING = "validate"
        TESTING = "test"
        PREDICTING = "predict"

    states.RunningStage = RunningStage
    trainer_mod.states = states
    pytorch.trainer = trainer_mod
    pytorch.utilities = utilities
    pytorch.LightningModule = LightningModule
    pytorch.LightningDataModule = LightningDataModule
    pytorch.Trainer = Trainer
    pytorch.Callback = fake.Callback
    fake.pytorch = pytorch


@pytest.fixture(scope="session")
def reference():
    """Importable reference package, or skip."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    _install_polars_stub()
    _install_lightning_stub()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import replay  # noqa: F401

    return replay


@pytest.fixture()
def random_log():
    rng = np.random.default_rng(7)
    n = 4000
    frame = pd.DataFrame(
        {
            "query_id": rng.integers(0, 300, n),
            "item_id": rng.integers(0, 500, n),
            "rating": rng.integers(1, 6, n).astype(float),
            "timestamp": rng.integers(0, 10_000, n),
        }
    ).drop_duplicates(["query_id", "item_id"])
    return frame.reset_index(drop=True)


@pytest.fixture()
def random_recs_gt():
    rng = np.random.default_rng(11)
    rows = []
    for u in range(250):
        n_rec = int(rng.integers(1, 15))
        items = rng.choice(400, size=n_rec, replace=False)
        scores = np.round(rng.normal(size=n_rec), 3)  # rounded → real ties
        rows += [(u, int(i), float(s)) for i, s in zip(items, scores)]
    recs = pd.DataFrame(rows, columns=["query_id", "item_id", "rating"])
    gt_rows = []
    for u in range(250):
        for i in rng.choice(400, size=int(rng.integers(1, 9)), replace=False):
            gt_rows.append((u, int(i)))
    gt = pd.DataFrame(gt_rows, columns=["query_id", "item_id"])
    return recs, gt
