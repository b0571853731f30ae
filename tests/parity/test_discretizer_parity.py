"""Differential parity: Discretizer vs the reference's own pandas
implementation (reference: replay/preprocessing/discretizer.py —
GreedyDiscretizingRule :63, QuantileDiscretizingRule :376, Discretizer
:603) on identical inputs, including the reference test suite's hard
cases (heavy value repetitions, NaN strategies).
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


def _frames():
    rng = np.random.default_rng(0)
    smooth = pd.DataFrame({"col": rng.normal(size=400)})
    # heavy repetitions (the reference's greedy edge cases,
    # tests/preprocessing/test_discretizer.py:112-168)
    rep1 = pd.DataFrame({"col": np.repeat([1.0, 2.0, 3.0], [150, 3, 2])})
    rep2 = pd.DataFrame({"col": np.repeat(np.arange(8.0), [40, 40, 40, 2, 2, 2, 2, 2])})
    skewed = pd.DataFrame({"col": rng.exponential(size=300).round(1)})
    return {"smooth": smooth, "rep1": rep1, "rep2": rep2, "skewed": skewed}


@pytest.mark.parametrize("case", ["smooth", "rep1", "rep2", "skewed"])
@pytest.mark.parametrize("n_bins", [3, 6])
def test_quantile_rule_matches_reference(case, n_bins):
    from replay.preprocessing.discretizer import (
        QuantileDiscretizingRule as RefRule,
    )

    from replay_tpu.preprocessing.discretizer import QuantileDiscretizingRule

    df = _frames()[case]
    ours = QuantileDiscretizingRule("col", n_bins).fit(df).transform(df)
    theirs = RefRule("col", n_bins).fit(df).transform(df)
    assert ours["col"].tolist() == theirs["col"].tolist()


@pytest.mark.parametrize("case", ["smooth", "rep1", "rep2", "skewed"])
@pytest.mark.parametrize("n_bins", [3, 6])
def test_greedy_rule_matches_reference(case, n_bins):
    from replay.preprocessing.discretizer import GreedyDiscretizingRule as RefRule

    from replay_tpu.preprocessing.discretizer import GreedyDiscretizingRule

    df = _frames()[case]
    ours = GreedyDiscretizingRule("col", n_bins).fit(df).transform(df)
    theirs = RefRule("col", n_bins).fit(df).transform(df)
    assert ours["col"].tolist() == theirs["col"].tolist()


@pytest.mark.parametrize("strategy", ["keep", "skip"])
def test_nan_strategies_match_reference(strategy):
    from replay.preprocessing.discretizer import QuantileDiscretizingRule as RefRule

    from replay_tpu.preprocessing.discretizer import QuantileDiscretizingRule

    rng = np.random.default_rng(1)
    vals = rng.normal(size=100)
    vals[::7] = np.nan
    df = pd.DataFrame({"col": vals})
    ours_rule = QuantileDiscretizingRule("col", 4, handle_invalid=strategy)
    theirs_rule = RefRule("col", 4, handle_invalid=strategy)
    ours = ours_rule.fit(df).transform(df)
    theirs = theirs_rule.fit(df).transform(df)
    assert len(ours) == len(theirs)
    o = ours["col"].fillna(-1).tolist()
    t = theirs["col"].fillna(-1).tolist()
    assert o == t


def test_nan_error_matches_reference():
    from replay.preprocessing.discretizer import QuantileDiscretizingRule as RefRule

    from replay_tpu.preprocessing.discretizer import QuantileDiscretizingRule

    df = pd.DataFrame({"col": [1.0, np.nan, 2.0]})
    with pytest.raises(ValueError):
        QuantileDiscretizingRule("col", 2, handle_invalid="error").fit(df).transform(df)
    with pytest.raises(ValueError):
        RefRule("col", 2, handle_invalid="error").fit(df).transform(df)


def test_partial_fit_matches_reference():
    from replay.preprocessing.discretizer import QuantileDiscretizingRule as RefRule

    from replay_tpu.preprocessing.discretizer import QuantileDiscretizingRule

    rng = np.random.default_rng(2)
    df1 = pd.DataFrame({"col": rng.normal(size=120)})
    df2 = pd.DataFrame({"col": rng.normal(size=120) + 3})
    probe = pd.DataFrame({"col": np.linspace(-3, 6, 50)})

    # reference contract (discretizer.py:465-476): partial_fit on an
    # UNFITTED rule == fit; on a fitted rule the reference raises
    # NotImplementedError — replay_tpu keeps the fitted bins (graceful
    # no-op) instead of raising
    ours = QuantileDiscretizingRule("col", 4).partial_fit(df1)
    theirs = RefRule("col", 4).partial_fit(df1)
    assert ours.transform(probe)["col"].tolist() == theirs.transform(probe)["col"].tolist()

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        RefRule("col", 4).fit(df1).partial_fit(df2)
    kept = QuantileDiscretizingRule("col", 4).fit(df1).partial_fit(df2)
    assert kept.transform(probe)["col"].tolist() == ours.transform(probe)["col"].tolist()

    # repeated fit is a NO-OP in both frameworks (reference test
    # test_descretizer_repeated_fit; reference fit :450 returns self)
    refit_ours = QuantileDiscretizingRule("col", 4).fit(df1).fit(df2)
    refit_theirs = RefRule("col", 4).fit(df1).fit(df2)
    assert (
        refit_ours.transform(probe)["col"].tolist()
        == ours.transform(probe)["col"].tolist()
        == refit_theirs.transform(probe)["col"].tolist()
    )
