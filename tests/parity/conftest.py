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
    fake = types.ModuleType("polars")

    class _FakeDF:
        pass

    fake.DataFrame = _FakeDF
    fake.Series = _FakeDF
    fake.Expr = _FakeDF
    fake.col = lambda *a, **k: None
    fake.read_parquet = lambda *a, **k: None
    sys.modules["polars"] = fake


@pytest.fixture(scope="session")
def reference():
    """Importable reference package, or skip."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    _install_polars_stub()
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
