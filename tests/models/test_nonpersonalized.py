import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest
from scipy.stats import norm

from replay_tpu.data import Dataset, FeatureHint, FeatureInfo, FeatureSchema, FeatureType
from replay_tpu.models import KLUCB, UCB, QueryPopRec, RandomRec, ThompsonSampling, Wilson


def make_dataset(df):
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, FeatureHint.RATING),
        ]
    )
    return Dataset(schema, df)


class TestWilson:
    def test_reference_doctest_value(self):
        """From reference Wilson doctest (replay/models/wilson.py:44-48)."""
        ds = make_dataset(
            pd.DataFrame({"user_id": [1, 2], "item_id": [1, 2], "rating": [1, 1]})
        )
        res = Wilson().fit_predict(ds, k=1).sort_values("user_id", ignore_index=True)
        assert res["rating"].tolist() == pytest.approx([0.206549, 0.206549], abs=1e-5)
        assert res["item_id"].tolist() == [2, 1]

    def test_non_binary_rating_raises(self):
        ds = make_dataset(
            pd.DataFrame({"user_id": [1], "item_id": [1], "rating": [0.5]})
        )
        with pytest.raises(ValueError):
            Wilson().fit(ds)


class TestUCB:
    @pytest.fixture()
    def ds(self):
        return make_dataset(
            pd.DataFrame(
                {
                    "user_id": [1, 2, 3, 3],
                    "item_id": [1, 2, 1, 2],
                    "rating": [1, 0, 0, 0],
                }
            )
        )

    def test_reference_doctest_values(self, ds):
        """From reference UCB doctest (replay/models/ucb.py:58-66)."""
        model = UCB()
        model.fit(ds)
        res = model.predict(ds, k=2, queries=[1, 2, 3, 4], items=[1, 2, 3])
        res = res.sort_values(
            ["user_id", "rating", "item_id"], ascending=[True, False, True]
        ).reset_index(drop=True)
        # item3 is cold -> fill = 1 + sqrt(2 ln 4) = 2.665109
        top = res[res["item_id"] == 3]["rating"].unique()
        assert top[0] == pytest.approx(2.665109, abs=1e-5)
        u2 = res[(res["user_id"] == 2) & (res["item_id"] == 1)]
        assert u2["rating"].iloc[0] == pytest.approx(1.677410, abs=1e-5)
        u1 = res[(res["user_id"] == 1) & (res["item_id"] == 2)]
        assert u1["rating"].iloc[0] == pytest.approx(1.177410, abs=1e-5)

    def test_refit_accumulates(self, ds):
        model = UCB()
        model.fit(ds)
        before = model.full_count
        model.refit(ds)
        assert model.full_count == 2 * before


class TestKLUCB:
    def test_bound_dominates_mean(self):
        ds = make_dataset(
            pd.DataFrame(
                {
                    "user_id": [1, 2, 3, 4],
                    "item_id": [1, 1, 1, 2],
                    "rating": [1, 0, 1, 1],
                }
            )
        )
        model = KLUCB()
        model.fit(ds)
        pop = model.item_popularity.set_index("item_id")["rating"]
        assert pop.loc[1] > 2 / 3
        # item 2 has p == 1: the reference's special case solves
        # log(1/q) = rhs → exp(-rhs), a SMALL value (kl_ucb.py:157-161) —
        # all-positive items rank low upstream, mirrored here
        import math

        rhs = math.log(4) + 0.0  # coef = 0 default
        assert pop.loc[2] == pytest.approx(math.exp(-rhs), abs=1e-9)

    def test_bisection_matches_scipy(self):
        from scipy.optimize import root_scalar

        from replay_tpu.models.kl_ucb import kl_ucb_bound, _bernoulli_kl

        pos, total, rhs = np.array([3.0]), np.array([10.0]), np.array([2.0])
        ours = kl_ucb_bound(pos, total, rhs)[0]
        p = 0.3

        ref = root_scalar(
            f=lambda q: total[0] * _bernoulli_kl(np.array([p]), np.array([q]))[0] - rhs[0],
            bracket=[p, 1 - 1e-12],
            method="brentq",
        ).root
        assert ours == pytest.approx(ref, abs=1e-8)

    def test_special_cases_match_reference_formulas(self):
        # reference get_ucb (kl_ucb.py:148-166): p=0 → root of
        # log(1/(1-q)) = rhs (NOT total-scaled); p=1 → root of log(1/q) = rhs
        import math

        from scipy.optimize import root_scalar

        from replay_tpu.models.kl_ucb import kl_ucb_bound

        rhs_val = 2.5
        zeros = kl_ucb_bound(np.array([0.0]), np.array([7.0]), np.array([rhs_val]))[0]
        ref0 = root_scalar(
            f=lambda q: math.log(1 / (1 - q)) - rhs_val, bracket=[0, 1 - 1e-12],
            method="brentq",
        ).root
        assert zeros == pytest.approx(ref0, abs=1e-9)

        ones = kl_ucb_bound(np.array([7.0]), np.array([7.0]), np.array([rhs_val]))[0]
        ref1 = root_scalar(
            f=lambda q: math.log(1 / q) - rhs_val, bracket=[1e-12, 1],
            method="brentq",
        ).root
        assert ones == pytest.approx(ref1, abs=1e-9)

    def test_cold_fill_matches_reference(self):
        # reference fill = 1 + sqrt(coef * log(n)) (kl_ucb.py:173)
        import math

        ds = make_dataset(
            pd.DataFrame(
                {"user_id": [1, 2, 3], "item_id": [1, 1, 2], "rating": [1, 0, 1]}
            )
        )
        model = KLUCB(exploration_coef=2.0)
        model.fit(ds)
        assert model.fill == pytest.approx(1 + math.sqrt(2.0 * math.log(3)), abs=1e-9)


class TestThompsonSampling:
    def test_fit_samples_beta(self):
        ds = make_dataset(
            pd.DataFrame(
                {
                    "user_id": [1, 2, 3, 4],
                    "item_id": [1, 1, 2, 2],
                    "rating": [1, 0, 1, 0],
                }
            )
        )
        model = ThompsonSampling(seed=42)
        model.fit(ds)
        assert len(model.item_popularity) == 2
        assert ((model.item_popularity["rating"] >= 0) & (model.item_popularity["rating"] <= 1)).all()


class TestRandomRec:
    @pytest.fixture()
    def ds(self):
        rng = np.random.RandomState(0)
        return make_dataset(
            pd.DataFrame(
                {
                    "user_id": rng.randint(0, 20, 200),
                    "item_id": rng.randint(0, 30, 200),
                    "rating": 1.0,
                }
            )
        )

    def test_distributions(self, ds):
        for dist in ("uniform", "popular_based", "relevance"):
            model = RandomRec(distribution=dist, seed=1)
            recs = model.fit_predict(ds, k=3)
            assert recs.groupby("user_id").size().max() <= 3
            # sampled probabilities sum to 1 at fit
            assert model.item_popularity["rating"].sum() == pytest.approx(1.0)

    def test_seed_reproducible(self, ds):
        r1 = RandomRec(seed=7).fit_predict(ds, k=3).reset_index(drop=True)
        r2 = RandomRec(seed=7).fit_predict(ds, k=3).reset_index(drop=True)
        pd.testing.assert_frame_equal(r1, r2)

    def test_no_duplicates_per_user(self, ds):
        recs = RandomRec(seed=3).fit_predict(ds, k=10)
        dupes = recs.groupby(["user_id", "item_id"]).size()
        assert (dupes == 1).all()

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            RandomRec(distribution="abracadabra")
        with pytest.raises(ValueError):
            RandomRec(distribution="popular_based", alpha=-1)


class TestQueryPopRec:
    def test_reference_doctest_values(self):
        """From reference QueryPopRec doctest (replay/models/query_pop_rec.py:56-62)."""
        ds = make_dataset(
            pd.DataFrame(
                {"user_id": [1, 1, 3], "item_id": [1, 2, 3], "rating": [2, 1, 1]}
            )
        )
        model = QueryPopRec()
        res = model.fit_predict(ds, 1, filter_seen_items=False).sort_values(
            "user_id", ignore_index=True
        )
        assert len(model.query_item_popularity) == 3
        assert res["item_id"].tolist() == [1, 3]
        assert res["rating"].tolist() == pytest.approx([2 / 3, 1.0])
