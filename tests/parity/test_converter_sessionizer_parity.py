"""Differential parity: CSRConverter and Sessionizer vs the reference's own
pandas implementations (reference: replay/preprocessing/converter.py:10,
replay/preprocessing/sessionizer.py:11).
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout absent", allow_module_level=True)

from tests.parity.conftest import _install_polars_stub  # noqa: E402

_install_polars_stub()
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))


def _log(seed=0, n=80):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n),
            "item_id": rng.integers(0, 20, n),
            "rating": rng.uniform(0.5, 5.0, n).round(2),
            "timestamp": np.sort(rng.choice(100_000, size=n, replace=False)),
        }
    )


@pytest.mark.parametrize("row_count", [None, 15])
@pytest.mark.parametrize("column_count", [None, 25])
def test_csr_converter_matches_reference(row_count, column_count):
    from replay.preprocessing import CSRConverter as RefConverter

    from replay_tpu.preprocessing import CSRConverter

    df = _log()
    kwargs = dict(
        first_dim_column="user_id",
        second_dim_column="item_id",
        data_column="rating",
        row_count=row_count,
        column_count=column_count,
    )
    ours = CSRConverter(**kwargs).transform(df)
    theirs = RefConverter(**kwargs).transform(df)
    assert ours.shape == theirs.shape
    assert np.allclose(ours.toarray(), theirs.toarray())


def test_csr_converter_default_data_matches_reference():
    # data_column=None → ones, duplicate (row, col) pairs sum
    from replay.preprocessing import CSRConverter as RefConverter

    from replay_tpu.preprocessing import CSRConverter

    df = pd.DataFrame({"u": [0, 0, 1, 1, 1], "i": [2, 2, 0, 1, 1]})
    kwargs = dict(first_dim_column="u", second_dim_column="i")
    ours = CSRConverter(**kwargs).transform(df)
    theirs = RefConverter(**kwargs).transform(df)
    assert np.allclose(ours.toarray(), theirs.toarray())


@pytest.mark.parametrize("session_gap", [10, 1000, 50_000])
@pytest.mark.parametrize("kwargs", [{}, {"min_inter_per_session": 2},
                                    {"max_inter_per_session": 3}])
def test_sessionizer_matches_reference(session_gap, kwargs):
    from replay.preprocessing import Sessionizer as RefSessionizer

    from replay_tpu.preprocessing import Sessionizer

    df = _log(seed=3, n=120)
    common = dict(
        user_column="user_id",
        time_column="timestamp",
        session_gap=session_gap,
        **kwargs,
    )
    ours = Sessionizer(**common).transform(df)
    theirs = RefSessionizer(**common).transform(df)
    key = ["user_id", "item_id", "timestamp"]
    o = ours.sort_values(key).reset_index(drop=True)
    t = theirs.sort_values(key).reset_index(drop=True)
    assert len(o) == len(t)
    assert o["session_id"].tolist() == t["session_id"].tolist()


@pytest.mark.parametrize("kwargs", [
    {"min_sessions_per_user": 2},
    {"max_sessions_per_user": 3},
    {"min_inter_per_session": 2, "min_sessions_per_user": 2},
])
def test_sessionizer_session_count_filters(kwargs):
    """min/max_sessions_per_user combos (round-5 grid widening)."""
    from replay.preprocessing import Sessionizer as RefSessionizer

    from replay_tpu.preprocessing import Sessionizer

    df = _log(seed=9, n=200)
    common = dict(user_column="user_id", time_column="timestamp",
                  session_gap=5000, **kwargs)
    ours = Sessionizer(**common).transform(df)
    theirs = RefSessionizer(**common).transform(df)
    key = ["user_id", "item_id", "timestamp"]
    o = ours.sort_values(key).reset_index(drop=True)
    t = theirs.sort_values(key).reset_index(drop=True)
    assert len(o) == len(t)
    assert o["session_id"].tolist() == t["session_id"].tolist()
