"""AssociationRules, ClusterRec, CatPopRec, LinUCB, Fallback tests."""

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
from replay_tpu.models import (
    AssociationRulesItemRec,
    CatPopRec,
    ClusterRec,
    LinUCB,
    PopRec,
)
from replay_tpu.scenarios import Fallback, fallback_merge


def make_schema(extra=()):
    feats = [
        FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
        FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
        FeatureInfo(
            "rating",
            FeatureType.NUMERICAL,
            feature_hint=FeatureHint.RATING,
            feature_source=FeatureSource.INTERACTIONS,
        ),
    ]
    return FeatureSchema(feats + list(extra))


class TestAssociationRules:
    def test_reference_doctest_case(self):
        """The reference's doctest (replay/models/association_rules.py:75-82):
        confidence(1→2)=1.0, lift=1.5, gain(1→2)=2.0; confidence(2→1)=0.5, gain=inf."""
        df = pd.DataFrame(
            {"user_id": [1, 1, 2, 3], "item_id": [1, 2, 2, 3], "rating": [2, 1, 4, 1]}
        )
        ds = Dataset(make_schema(), df)
        model = AssociationRulesItemRec(min_item_count=1, min_pair_count=0, session_column="user_id")
        model.fit(ds)
        rules = model.rules.set_index(["item_idx_one", "item_idx_two"])
        pos1 = np.searchsorted(model.fit_items, 1)
        pos2 = np.searchsorted(model.fit_items, 2)
        r12 = rules.loc[(pos1, pos2)]
        assert r12["confidence"] == 1.0
        assert r12["lift"] == 1.5
        assert r12["confidence_gain"] == 2.0
        r21 = rules.loc[(pos2, pos1)]
        assert r21["confidence"] == 0.5
        assert np.isinf(r21["confidence_gain"])

    def test_predict_and_metric_switch(self):
        rng = np.random.default_rng(0)
        rows = []
        for u in range(60):
            base = (u % 3) * 10
            for item in rng.choice(10, size=6, replace=False):
                rows.append((u, int(base + item), 1.0))
        ds = Dataset(make_schema(), pd.DataFrame(rows, columns=["user_id", "item_id", "rating"]))
        model = AssociationRulesItemRec(min_item_count=2, min_pair_count=2)
        model.fit(ds)
        recs = model.predict(ds, k=3)
        assert recs.groupby("user_id").size().max() <= 3
        model.similarity_metric = "lift"
        recs_lift = model.predict(ds, k=3)
        assert len(recs_lift) > 0
        nn = model.get_nearest_items([0], k=3, metric="confidence")
        assert len(nn) > 0


class TestClusterRec:
    def test_clusters_drive_recommendations(self):
        rng = np.random.default_rng(0)
        rows, feat_rows = [], []
        for u in range(60):
            g = u % 3
            feat_rows.append((u, float(g * 10) + rng.normal(0, 0.1), float(g) + rng.normal(0, 0.1)))
            for _ in range(5):
                rows.append((u, int(g * 20 + rng.integers(0, 20)), 1.0))
        inter = pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])
        qf = pd.DataFrame(feat_rows, columns=["user_id", "f1", "f2"])
        schema = make_schema(
            [
                FeatureInfo("f1", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
                FeatureInfo("f2", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
            ]
        )
        ds = Dataset(schema, inter, query_features=qf)
        model = ClusterRec(num_clusters=3, seed=0)
        model.fit(ds)
        recs = model.predict(ds, k=5)
        hits = tot = 0
        for u, grp in recs.groupby("user_id"):
            g = u % 3
            hits += ((grp["item_id"] >= g * 20) & (grp["item_id"] < (g + 1) * 20)).sum()
            tot += len(grp)
        assert hits / tot > 0.8

    def test_requires_query_features(self):
        ds = Dataset(
            make_schema(),
            pd.DataFrame({"user_id": [0], "item_id": [0], "rating": [1.0]}),
        )
        with pytest.raises(ValueError):
            ClusterRec(num_clusters=2).fit(ds)


class TestCatPopRec:
    def test_flat_categories(self):
        df = pd.DataFrame(
            {
                "user_id": [0, 1, 2, 3, 4, 5],
                "item_id": [10, 10, 11, 20, 20, 21],
                "rating": [1.0] * 6,
                "category": ["a", "a", "a", "b", "b", "b"],
            }
        )
        ds = Dataset(make_schema(), df)
        model = CatPopRec()
        model.fit(ds)
        recs = model.predict(["a", "b"], k=2)
        top_a = recs[recs["category"] == "a"].iloc[0]
        assert top_a["item_id"] == 10
        assert np.isclose(top_a["rating"], 2 / 3)
        top_b = recs[recs["category"] == "b"].iloc[0]
        assert top_b["item_id"] == 20

    def test_category_tree(self):
        tree = pd.DataFrame(
            {"category": ["root", "a", "b"], "parent_cat": [None, "root", "root"]}
        )
        df = pd.DataFrame(
            {
                "user_id": [0, 1, 2],
                "item_id": [10, 10, 20],
                "rating": [1.0] * 3,
                "category": ["a", "a", "b"],
            }
        )
        ds = Dataset(make_schema(), df)
        model = CatPopRec(cat_tree=tree)
        model.fit(ds)
        recs = model.predict(["root"], k=5)
        # root aggregates both leaves: item 10 (2/3) ahead of 20 (1/3)
        assert recs.iloc[0]["item_id"] == 10
        assert np.isclose(recs.iloc[0]["rating"], 2 / 3)


class TestLinUCB:
    def make_dataset(self):
        rng = np.random.default_rng(0)
        # reward depends linearly on user feature per arm
        users = np.arange(60)
        feats = rng.normal(size=(60, 3))
        rows = []
        true_theta = rng.normal(size=(4, 3))
        for u in users:
            for a in range(4):
                r = float(feats[u] @ true_theta[a])
                rows.append((u, a, r))
        inter = pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])
        qf = pd.DataFrame(
            {"user_id": users, "f1": feats[:, 0], "f2": feats[:, 1], "f3": feats[:, 2]}
        )
        itf = pd.DataFrame({"item_id": np.arange(4), "g1": rng.normal(size=4)})
        schema = make_schema(
            [
                FeatureInfo("f1", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
                FeatureInfo("f2", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
                FeatureInfo("f3", FeatureType.NUMERICAL, feature_source=FeatureSource.QUERY_FEATURES),
                FeatureInfo("g1", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES),
            ]
        )
        return Dataset(schema, inter, query_features=qf, item_features=itf), true_theta, feats

    def test_disjoint_learns_linear_rewards(self):
        ds, theta, feats = self.make_dataset()
        model = LinUCB(eps=0.0, alpha=0.01)
        model.fit(ds)
        # predicted best arm should match true best arm for most users
        scores = model._score_block(np.arange(60), np.arange(4), ds)
        true_scores = feats @ theta.T
        agreement = (scores.argmax(1) == true_scores.argmax(1)).mean()
        assert agreement > 0.9

    def test_exploration_term_changes_scores(self):
        ds, _, _ = self.make_dataset()
        greedy = LinUCB(eps=0.0, alpha=1.0)
        explore = LinUCB(eps=5.0, alpha=1.0)
        greedy.fit(ds)
        explore.fit(ds)
        s1 = greedy._score_block(np.arange(5), np.arange(4), ds)
        s2 = explore._score_block(np.arange(5), np.arange(4), ds)
        assert (s2 >= s1 - 1e-6).all()

    def test_hybrid_mode_runs(self):
        ds, _, _ = self.make_dataset()
        model = LinUCB(eps=0.0, alpha=1.0, is_hybrid=True)
        model.fit(ds)
        recs = model.predict(ds, k=2, filter_seen_items=False)
        assert recs.groupby("user_id").size().max() <= 2

    def test_missing_features_raise(self):
        ds = Dataset(
            make_schema(),
            pd.DataFrame({"user_id": [0], "item_id": [0], "rating": [1.0]}),
        )
        with pytest.raises(ValueError):
            LinUCB(eps=1.0).fit(ds)


class TestFallback:
    def test_merge_keeps_main_on_top(self):
        base = pd.DataFrame(
            {"query_id": [0, 0], "item_id": [1, 2], "rating": [0.5, 0.4]}
        )
        fill = pd.DataFrame(
            {"query_id": [0, 1], "item_id": [3, 1], "rating": [10.0, 9.0]}
        )
        merged = fallback_merge(base, fill, k=3)
        u0 = merged[merged["query_id"] == 0]
        assert list(u0["item_id"])[:2] == [1, 2]  # main stays on top
        assert 3 in set(u0["item_id"])
        assert set(merged[merged["query_id"] == 1]["item_id"]) == {1}

    def test_fallback_scenario_fills_cold_users(self):
        rng = np.random.default_rng(0)
        rows = []
        for u in range(20):
            n = 10 if u < 10 else 1  # users 10+ are cold
            for item in rng.choice(15, size=n, replace=False):
                rows.append((u, int(item), 1.0))
        ds = Dataset(make_schema(), pd.DataFrame(rows, columns=["user_id", "item_id", "rating"]))
        from replay_tpu.models import ItemKNN

        model = Fallback(ItemKNN(num_neighbours=5), PopRec(), threshold=5)
        model.fit(ds)
        recs = model.predict(ds, k=3)
        per_user = recs.groupby("user_id").size()
        # every user incl. cold ones gets recommendations
        assert set(per_user.index) == set(range(20))
        assert per_user.max() <= 3
