import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import PopRec


def make_dataset(df):
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )
    return Dataset(schema, df)


@pytest.fixture()
def dataset():
    return make_dataset(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2, 2, 3, 4],
                "item_id": [1, 2, 2, 3, 3, 3],
                "rating": [0.5, 1, 0.1, 0.8, 0.7, 1],
            }
        )
    )


class TestPopRec:
    def test_reference_doctest_values(self, dataset):
        """Values from reference PopRec doctest (replay/models/pop_rec.py:60-67)."""
        res = PopRec().fit_predict(dataset, 1).sort_values("user_id", ignore_index=True)
        assert res["item_id"].tolist() == [3, 1, 2, 2]
        assert res["rating"].tolist() == pytest.approx([0.75, 0.25, 0.5, 0.5])

    def test_no_filter_seen(self, dataset):
        res = (
            PopRec()
            .fit_predict(dataset, 1, filter_seen_items=False)
            .sort_values("user_id", ignore_index=True)
        )
        assert res["item_id"].tolist() == [3, 3, 3, 3]
        assert res["rating"].tolist() == pytest.approx([0.75] * 4)

    def test_use_rating(self, dataset):
        res = (
            PopRec(use_rating=True)
            .fit_predict(dataset, 1)
            .sort_values("user_id", ignore_index=True)
        )
        assert res["item_id"].tolist() == [3, 1, 2, 2]
        assert res["rating"].tolist() == pytest.approx([0.625, 0.125, 0.275, 0.275])

    def test_k_greater_than_items(self, dataset):
        res = PopRec().fit_predict(dataset, 10, filter_seen_items=False)
        assert res.groupby("user_id").size().max() == 3

    def test_cold_items_fill(self, dataset):
        model = PopRec()
        model.fit(dataset)
        res = model.predict(dataset, 5, items=[1, 2, 3, 99], filter_seen_items=False)
        cold = res[res["item_id"] == 99]
        assert (cold["rating"] == model.fill).all()
        # add_cold_items=False drops the cold item
        model.add_cold_items = False
        res2 = model.predict(dataset, 5, items=[1, 2, 3, 99], filter_seen_items=False)
        assert 99 not in res2["item_id"].tolist()

    def test_save_load(self, dataset, tmp_path):
        model = PopRec()
        model.fit(dataset)
        model.save(str(tmp_path / "pop"))
        loaded = PopRec.load(str(tmp_path / "pop"))
        r1 = model.predict(dataset, 2).reset_index(drop=True)
        r2 = loaded.predict(dataset, 2).reset_index(drop=True)
        pd.testing.assert_frame_equal(r1, r2)

    def test_predict_pairs(self, dataset):
        model = PopRec()
        model.fit(dataset)
        pairs = pd.DataFrame({"user_id": [1, 2], "item_id": [3, 1]})
        res = model.predict_pairs(pairs, dataset)
        assert res["rating"].tolist() == pytest.approx([0.75, 0.25])
