import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import ItemKNN


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
    # u0: {0,1}; u1: {0,2}; u2: {1,2}; u3: {0}
    return make_dataset(
        pd.DataFrame(
            {
                "user_id": [0, 0, 1, 1, 2, 2, 3],
                "item_id": [0, 1, 0, 2, 1, 2, 0],
                "rating": [1.0] * 7,
            }
        )
    )


class TestItemKNN:
    def test_cosine_similarity_hand_check(self, dataset):
        model = ItemKNN(num_neighbours=10)
        model.fit(dataset)
        sim = np.asarray(model._sim_dense)
        # item0 count=3, item1 count=2, item2 count=2
        # co(0,1)=1, co(0,2)=1, co(1,2)=1
        assert sim[0, 1] == pytest.approx(1 / (np.sqrt(3) * np.sqrt(2)))
        assert sim[1, 2] == pytest.approx(1 / 2)
        assert sim[0, 0] == 0.0
        assert np.allclose(sim, sim.T)

    def test_shrink(self, dataset):
        model = ItemKNN(shrink=1.0)
        model.fit(dataset)
        sim = np.asarray(model._sim_dense)
        assert sim[1, 2] == pytest.approx(1 / (2 + 1))

    def test_predict_scores_sum_of_similarities(self, dataset):
        model = ItemKNN()
        model.fit(dataset)
        sim = np.asarray(model._sim_dense)
        recs = model.predict(dataset, k=1)
        # u3 saw only item0 -> scores: item1=sim01, item2=sim02; sim01 > sim02? equal counts -> equal
        u3 = recs[recs["user_id"] == 3]
        assert len(u3) == 1
        assert u3["rating"].iloc[0] == pytest.approx(max(sim[0, 1], sim[0, 2]))

    def test_filter_seen(self, dataset):
        model = ItemKNN()
        recs = model.fit_predict(dataset, k=3)
        inter = dataset.interactions
        seen = set(zip(inter["user_id"], inter["item_id"]))
        for q, i in zip(recs["user_id"], recs["item_id"]):
            assert (q, i) not in seen

    def test_num_neighbours_truncation(self):
        rng = np.random.RandomState(0)
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 30, 600),
                "item_id": rng.randint(0, 40, 600),
                "rating": 1.0,
            }
        )
        model = ItemKNN(num_neighbours=3)
        model.fit(make_dataset(df))
        sim = np.asarray(model._sim_dense)
        assert ((sim != 0).sum(axis=1) <= 3).all()

    def test_weightings_run(self, dataset):
        for weighting in ("tf_idf", "bm25"):
            model = ItemKNN(weighting=weighting)
            recs = model.fit_predict(dataset, k=2)
            assert len(recs) > 0
            assert np.isfinite(recs["rating"]).all()

    def test_invalid_weighting(self):
        with pytest.raises(ValueError):
            ItemKNN(weighting="bogus")

    def test_get_nearest_items(self, dataset):
        model = ItemKNN()
        model.fit(dataset)
        nearest = model.get_nearest_items([0], k=2)
        assert set(nearest["neighbour_item_idx"]) == {1, 2}

    def test_save_load(self, dataset, tmp_path):
        model = ItemKNN()
        model.fit(dataset)
        model.save(str(tmp_path / "knn"))
        loaded = ItemKNN.load(str(tmp_path / "knn"))
        r1 = model.predict(dataset, 2).reset_index(drop=True)
        r2 = loaded.predict(dataset, 2).reset_index(drop=True)
        pd.testing.assert_frame_equal(r1, r2)

    def test_cold_user_in_predict_dataset(self, dataset):
        """NeighbourRec can predict for queries unseen at fit (profile from
        prediction dataset)."""
        model = ItemKNN()
        model.fit(dataset)
        new_inter = pd.DataFrame(
            {"user_id": [99, 99], "item_id": [0, 1], "rating": [1.0, 1.0]}
        )
        new_ds = make_dataset(new_inter)
        recs = model.predict(new_ds, k=1, queries=[99])
        assert recs["user_id"].tolist() == [99]
        assert recs["item_id"].iloc[0] == 2
