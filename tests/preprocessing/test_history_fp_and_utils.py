"""History-based feature processors + utils/common tests."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.preprocessing.history_based_fp import (
    ConditionalPopularityProcessor,
    HistoryBasedFeaturesProcessor,
    LogStatFeaturesProcessor,
)
from replay_tpu.utils.common import (
    filter_cold,
    get_top_k,
    get_top_k_recs,
    horizontal_explode,
    sample_top_k_recs,
)


@pytest.fixture()
def log():
    return pd.DataFrame(
        {
            "query_id": [0, 0, 0, 1, 1, 2],
            "item_id": [10, 11, 12, 10, 11, 12],
            "rating": [5.0, 3.0, 1.0, 4.0, 4.0, 2.0],
            "timestamp": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-10", "2024-01-01", "2024-01-05", "2024-01-03"]
            ),
        }
    )


class TestLogStat:
    def test_user_features(self, log):
        proc = LogStatFeaturesProcessor().fit(log)
        uf = proc.user_log_features.set_index("query_id")
        np.testing.assert_allclose(uf.loc[0, "u_log_num_interact"], np.log(3))
        assert uf.loc[0, "u_history_length_days"] == 9.0
        assert uf.loc[2, "u_last_interaction_gap_days"] == 7.0
        # abnormality: user 2 rated item 12 exactly at its own item mean contribution
        assert "abnormality" in uf.columns

    def test_transform_joins_and_flags_cold(self, log):
        proc = LogStatFeaturesProcessor().fit(log)
        frame = pd.DataFrame({"query_id": [0, 99], "item_id": [10, 10]})
        out = proc.transform(frame)
        assert out.loc[out["query_id"] == 99, "u_is_cold"].iloc[0] == 1
        assert out.loc[out["query_id"] == 0, "u_is_cold"].iloc[0] == 0


class TestConditionalPopularity:
    def test_item_pop_by_user_category(self, log):
        user_features = pd.DataFrame({"query_id": [0, 1, 2], "age": ["young", "young", "old"]})
        proc = ConditionalPopularityProcessor(["age"]).fit(log, user_features)
        pairs = pd.DataFrame({"item_id": [10, 12], "age": ["young", "old"]})
        out = proc.transform(pairs)
        # item 10: 2 young interactions of 2 total → 1.0
        assert out.loc[0, "pop_by_age"] == 1.0
        # item 12: 1 old of 2 total → 0.5
        assert out.loc[1, "pop_by_age"] == 0.5

    def test_bundle(self, log):
        user_features = pd.DataFrame({"query_id": [0, 1, 2], "age": ["y", "y", "o"]})
        proc = HistoryBasedFeaturesProcessor(user_cat_features_list=["age"])
        proc.fit(log, user_features=user_features)
        out = proc.transform(
            pd.DataFrame({"query_id": [0], "item_id": [10], "age": ["y"]})
        )
        assert "u_log_num_interact" in out.columns
        assert "pop_by_age" in out.columns

    def test_unfitted_raises(self):
        with pytest.raises(RuntimeError):
            HistoryBasedFeaturesProcessor().transform(pd.DataFrame())


class TestCommonUtils:
    def test_get_top_k_recs_tie_break(self):
        recs = pd.DataFrame(
            {"query_id": [0, 0, 0], "item_id": [5, 3, 7], "rating": [1.0, 1.0, 2.0]}
        )
        out = get_top_k_recs(recs, 2)
        assert list(out["item_id"]) == [7, 3]  # rating desc, then item asc

    def test_get_top_k_custom_order(self):
        df = pd.DataFrame({"g": [0, 0, 0], "a": [1, 2, 3], "b": [9, 8, 7]})
        out = get_top_k(df, "g", [("b", True)], 1)
        assert out["a"].iloc[0] == 3

    def test_sample_top_k_prefers_high_scores(self):
        recs = pd.DataFrame(
            {
                "query_id": [0] * 3 * 200,
                "item_id": list(range(3)) * 200,
                "rating": [100.0, 1.0, 1.0] * 200,
            }
        )
        recs["query_id"] = np.repeat(np.arange(200), 3)
        out = sample_top_k_recs(recs, 1, seed=0)
        frac_best = (out["item_id"] == 0).mean()
        assert frac_best > 0.9
        assert len(out) == 200

    def test_filter_cold(self):
        df = pd.DataFrame({"item_id": [1, 2, 3]})
        warm = pd.DataFrame({"item_id": [1, 3]})
        n, out = filter_cold(df, warm, "item_id")
        assert n == 1
        assert list(out["item_id"]) == [1, 3]
        assert filter_cold(None, warm, "item_id") == (0, None)

    def test_horizontal_explode(self):
        df = pd.DataFrame({"id": [1, 2], "vec": [np.array([1.0, 2.0]), np.array([3.0, 4.0])]})
        out = horizontal_explode(df, "vec", "f", ["id"])
        assert list(out.columns) == ["id", "f_0", "f_1"]
        assert out.loc[1, "f_1"] == 4.0


def test_step_timer():
    from replay_tpu.utils.profiler import StepTimer

    timer = StepTimer()
    with timer.section("work"):
        pass
    with timer.section("work"):
        pass
    summary = timer.summary()
    assert summary["work"]["count"] == 2
    assert summary["work"]["total_s"] >= 0
