"""Model registry + optimize + time utils tests."""

import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data.dataset import Dataset
from replay_tpu.data.schema import (
    FeatureHint,
    FeatureInfo,
    FeatureSchema,
    FeatureSource,
    FeatureType,
)
from replay_tpu.models import ALSWrap, ItemKNN, PopRec
from replay_tpu.utils import (
    get_item_recency,
    item_distribution,
    load,
    load_splitter,
    save,
    save_splitter,
    smoothe_time,
)
from replay_tpu.splitters import RatioSplitter


@pytest.fixture()
def dataset():
    rng = np.random.default_rng(0)
    rows = []
    for u in range(40):
        g = u % 4
        for t in range(15):
            item = int(g * 15 + rng.integers(0, 15)) if rng.random() < 0.85 else int(rng.integers(0, 60))
            rows.append((u, item, 1.0, t))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"]).drop_duplicates(
        ["user_id", "item_id"]
    )
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo(
                "rating",
                FeatureType.NUMERICAL,
                feature_hint=FeatureHint.RATING,
                feature_source=FeatureSource.INTERACTIONS,
            ),
            FeatureInfo(
                "timestamp",
                FeatureType.NUMERICAL,
                feature_hint=FeatureHint.TIMESTAMP,
                feature_source=FeatureSource.INTERACTIONS,
            ),
        ]
    )
    return Dataset(schema, df)


@pytest.mark.parametrize(
    "model", [PopRec(), ItemKNN(num_neighbours=5), ALSWrap(rank=8, seed=0, num_iterations=3)],
    ids=["poprec", "knn", "als"],
)
def test_save_load_roundtrip(tmp_path, dataset, model):
    model.fit(dataset)
    recs_before = model.predict(dataset, k=5)
    save(model, tmp_path / "m", overwrite=True)
    restored = load(tmp_path / "m")
    assert type(restored) is type(model)
    recs_after = restored.predict(dataset, k=5)
    pd.testing.assert_frame_equal(
        recs_before.reset_index(drop=True), recs_after.reset_index(drop=True)
    )


def test_save_refuses_overwrite(tmp_path, dataset):
    model = PopRec()
    model.fit(dataset)
    save(model, tmp_path / "m")
    with pytest.raises(FileExistsError):
        save(model, tmp_path / "m")


def test_splitter_roundtrip(tmp_path):
    splitter = RatioSplitter(test_size=0.3, divide_column="user_id")
    save_splitter(splitter, tmp_path / "s")
    restored = load_splitter(tmp_path / "s")
    assert isinstance(restored, RatioSplitter)
    assert restored.test_size == 0.3


def test_optimize_finds_better_params(dataset):
    inter = dataset.interactions.sort_values(["user_id", "timestamp"])
    test = inter.groupby("user_id").tail(3)
    train = inter.drop(index=test.index)
    train_ds = Dataset(dataset.feature_schema, train)
    test_ds = Dataset(dataset.feature_schema, test, check_consistency=False)
    model = ItemKNN()
    best = model.optimize(train_ds, test_ds, budget=4)
    assert set(best) == {"num_neighbours", "shrink", "weighting"}
    assert len(model._study.trials) >= 4
    assert model._study.best_trial.value > 0


def test_optimize_param_borders(dataset):
    model = ItemKNN()
    with pytest.raises(ValueError):
        model._effective_search_space({"bogus": [1, 2]})
    space = model._effective_search_space({"num_neighbours": [5, 10]})
    assert space["num_neighbours"]["args"] == [5, 10]


class TestTimeSmoothing:
    def test_exp_reference_values(self):
        """Reference doctest values (replay/utils/time.py smoothe_time exp)."""
        df = pd.DataFrame(
            {
                "item_idx": [1, 1, 2, 3, 3],
                "timestamp": ["2099-03-19", "2099-03-20", "2099-03-22", "2099-03-25", "2099-03-27"],
                "relevance": [1.0, 1.0, 1.0, 1.0, 1.0],
            }
        )
        out = smoothe_time(df, kind="exp").sort_values("timestamp")
        np.testing.assert_allclose(
            out["relevance"].round(4).to_numpy(), [0.8312, 0.8507, 0.8909, 0.9548, 1.0]
        )

    def test_linear_and_power(self):
        df = pd.DataFrame(
            {"item_idx": [1, 2], "timestamp": ["2099-03-19", "2099-03-27"], "relevance": [1.0, 1.0]}
        )
        lin = smoothe_time(df, kind="linear")
        assert lin["relevance"].iloc[1] == 1.0
        np.testing.assert_allclose(lin["relevance"].iloc[0], 1 - (0.5 / 30) * 8)
        with pytest.raises(ValueError):
            smoothe_time(df, kind="bogus")

    def test_item_recency(self):
        df = pd.DataFrame(
            {
                "item_idx": [1, 1, 2],
                "timestamp": ["2099-03-19", "2099-03-21", "2099-03-27"],
                "relevance": [1.0, 1.0, 1.0],
            }
        )
        out = get_item_recency(df, kind="exp")
        assert len(out) == 2
        assert out.loc[out["item_idx"] == 2, "relevance"].iloc[0] == 1.0


def test_item_distribution():
    log = pd.DataFrame({"query_id": [0, 1, 1], "item_id": [5, 5, 6], "rating": [1, 1, 1]})
    recs = pd.DataFrame(
        {"query_id": [0, 0, 1], "item_id": [5, 6, 6], "rating": [0.9, 0.8, 0.7]}
    )
    dist = item_distribution(log, recs, k=1)
    row5 = dist[dist["item_id"] == 5].iloc[0]
    assert row5["user_count"] == 2 and row5["rec_count"] == 1
    row6 = dist[dist["item_id"] == 6].iloc[0]
    assert row6["user_count"] == 1 and row6["rec_count"] == 1
