"""Conditional imports, NeuralTS, and experimental preprocessing tests."""

import pytest as _pytest

pytestmark = _pytest.mark.experimental

import numpy as np
import pandas as pd
import pytest


class TestConditionalAccess:
    def test_parent_module_access_raises(self):
        import replay_tpu.experimental.models as m

        with pytest.raises(m.ConditionalAccessError):
            _ = m.LightFMWrap
        with pytest.raises(m.ConditionalAccessError):
            _ = m.ImplicitWrap

    def test_direct_import_raises_clear_error_when_missing(self):
        from replay_tpu.experimental.models.lightfm_wrap import (
            LIGHTFM_AVAILABLE,
            LightFMWrap,
        )

        if not LIGHTFM_AVAILABLE:
            with pytest.raises(ImportError, match="lightfm"):
                LightFMWrap()

    def test_obp_wrapper_works_without_obp(self):
        """The wrapper's estimators are native; obp is never required
        (reference delegates to obp, absent here by design)."""
        from replay_tpu.experimental.scenarios.obp_wrapper import (
            OBPOfflinePolicyLearner,
        )

        learner = OBPOfflinePolicyLearner(None, n_actions=5)
        assert learner.len_list == 1


def test_neural_ts_learns_preferences():
    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
    )
    from replay_tpu.experimental.models import NeuralTS

    rng = np.random.default_rng(0)
    rows = []
    for u in range(40):
        g = u % 2
        for i in range(20):
            reward = 1.0 if (i < 10) == (g == 0) else 0.0
            rows.append((u, i, reward))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                        feature_source=FeatureSource.INTERACTIONS),
        ]
    )
    ds = Dataset(schema, df)
    # linear posterior-sampling mode (NeuralTS-paper head, kept from round 1)
    model = NeuralTS(embedding_dim=8, phi_dim=8, nu=0.01, epochs=60, seed=0,
                     exploration="linear", loss="logistic", head_dropout=0.2,
                     deep_dropout=0.1, learning_rate=3e-3, cnt_neg_samples=0)
    model.fit(ds)
    scores = model._score_block(np.arange(40), np.arange(20), ds)
    # group-0 users should rank items 0-9 above 10-19
    pref = scores[::2, :10].mean() - scores[::2, 10:].mean()
    assert pref > 0


class TestDataPreparator:
    def test_renames_and_fills_defaults(self):
        # reference canonical legacy layout (data_preparator.py:607):
        # user_id/item_id/timestamp/relevance with 1.0 / 2099-01-01 defaults
        from replay_tpu.experimental.preprocessing import DataPreparator

        raw = pd.DataFrame({"u": [1, 2], "m": [10, 20]})
        out = DataPreparator().transform(
            columns_mapping={"user_id": "u", "item_id": "m"}, data=raw
        )
        assert list(out.columns[:4]) == ["user_id", "item_id", "timestamp", "relevance"]
        assert (out["relevance"] == 1.0).all()
        assert (out["timestamp"] == pd.Timestamp("2099-01-01")).all()

    def test_legacy_call_shape(self):
        # pre-round-3 replay_tpu surface: mapping at init, frame positional
        from replay_tpu.experimental.preprocessing import DataPreparator

        raw = pd.DataFrame({"u": [1, 2], "m": [10, 20]})
        out = DataPreparator({"query_id": "u", "item_id": "m"}).transform(raw)
        assert list(out.columns[:4]) == ["user_id", "item_id", "timestamp", "relevance"]

    def test_feature_frame_mode(self):
        from replay_tpu.experimental.preprocessing import DataPreparator

        raw = pd.DataFrame({"u": [1, 2], "age": [30, 40]})
        out = DataPreparator().transform(columns_mapping={"user_id": "u"}, data=raw)
        assert list(out.columns) == ["user_id", "age"]  # features untouched

    def test_reads_from_file(self, tmp_path):
        from replay_tpu.experimental.preprocessing import DataPreparator

        raw = pd.DataFrame({"u": [1], "m": [2], "r": [4.0]})
        raw.to_parquet(tmp_path / "log.parquet")
        out = DataPreparator().transform(
            columns_mapping={"user_id": "u", "item_id": "m", "relevance": "r"},
            path=str(tmp_path / "log.parquet"),
            format_type="parquet",
        )
        assert out["relevance"].tolist() == [4.0]

    def test_missing_source_column(self):
        from replay_tpu.experimental.preprocessing import DataPreparator

        with pytest.raises(ValueError, match="absent in dataframe"):
            DataPreparator().transform(
                columns_mapping={"user_id": "nope", "item_id": "m"},
                data=pd.DataFrame({"m": [1]}),
            )

    def test_no_id_mapping_error(self):
        from replay_tpu.experimental.preprocessing import DataPreparator

        with pytest.raises(ValueError, match="user ids or for item ids"):
            DataPreparator().transform(
                columns_mapping={"timestamp": "t"}, data=pd.DataFrame({"t": [1]})
            )

    def test_empty_frame_error(self):
        from replay_tpu.experimental.preprocessing import DataPreparator

        with pytest.raises(ValueError, match="empty"):
            DataPreparator().transform(
                columns_mapping={"user_id": "u", "item_id": "m"},
                data=pd.DataFrame({"u": [], "m": []}),
            )


class TestPadder:
    def test_pad_and_cut(self):
        from replay_tpu.experimental.preprocessing import Padder

        df = pd.DataFrame({"seq": [[1, 2], [1, 2, 3, 4, 5]]})
        out = Padder("seq", padding_side="left", padding_value=0, array_size=3).transform(df)
        assert out["seq"].iloc[0] == [0, 1, 2]
        assert out["seq"].iloc[1] == [3, 4, 5]  # cut keeps the tail

    def test_right_padding(self):
        from replay_tpu.experimental.preprocessing import Padder

        df = pd.DataFrame({"seq": [[7]]})
        out = Padder("seq", padding_side="right", padding_value=-1, array_size=3).transform(df)
        assert out["seq"].iloc[0] == [7, -1, -1]


class TestSequenceGenerator:
    def test_rolling_history(self):
        # reference semantics (sequence_generator.py doctest): one row per
        # NON-FIRST interaction, window list + label column
        from replay_tpu.experimental.preprocessing import SequenceGenerator

        df = pd.DataFrame(
            {"user": [1, 1, 1, 2], "item": [10, 11, 12, 20], "t": [0, 1, 2, 0]}
        )
        gen = SequenceGenerator(
            "user", orderby_column=["user", "t"], transform_columns="item", get_list_len=True
        )
        out = gen.transform(df)
        assert out["item_list"].tolist() == [[10], [10, 11]]
        assert out["label_item"].tolist() == [11, 12]
        assert out["list_len"].tolist() == [1, 2]

    def test_window_size(self):
        from replay_tpu.experimental.preprocessing import SequenceGenerator

        df = pd.DataFrame({"user": [1] * 4, "item": [1, 2, 3, 4], "t": range(4)})
        out = SequenceGenerator(
            "user", orderby_column=["user", "t"], transform_columns="item", len_window=2
        ).transform(df)
        assert out["item_list"].iloc[2] == [2, 3]
        assert out["label_item"].iloc[2] == 4


def test_warp_loss_matches_reference_semantics():
    """_warp_loss vs a literal re-enactment of the reference loop
    (replay/experimental/models/neural_ts.py:65): first margin-violating
    negative in order, rank weight log(floor((N-1)/tries)), hinge at the
    violating trial, rows with no violation (or exhausted trials) dropped."""
    import jax.numpy as jnp
    from replay_tpu.experimental.models.neural_ts import _warp_loss

    rng = np.random.default_rng(5)
    p, t, n_labels = 12, 6, 50
    pos = rng.normal(size=p).astype(np.float32)
    neg = rng.normal(size=(p, t)).astype(np.float32)
    valid = (rng.random(p) > 0.2).astype(np.float32)

    expected = 0.0
    for r in range(p):
        if valid[r] == 0:
            continue
        tries = None
        for j in range(t):
            if 1.0 + neg[r, j] - pos[r] > 0:
                tries = j + 1
                break
        if tries is None:
            continue
        w = np.log(max(np.floor((n_labels - 1) / tries), 1.0))
        expected += w * (1.0 - pos[r] + neg[r, tries - 1])

    got = float(_warp_loss(jnp.asarray(pos), jnp.asarray(neg), n_labels,
                           jnp.asarray(valid)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_neural_ts_uses_item_features():
    """Wide&Deep feature path (reference neural_ts.py wide/cat/continuous
    columns): with rewards determined by an item feature, scores must track
    the feature."""
    from replay_tpu.data.dataset import Dataset
    from replay_tpu.data.schema import (
        FeatureHint,
        FeatureInfo,
        FeatureSchema,
        FeatureSource,
        FeatureType,
    )
    from replay_tpu.experimental.models import NeuralTS

    rng = np.random.default_rng(1)
    n_items = 30
    good = np.zeros(n_items); good[::2] = 1.0  # even items are good
    rows = []
    for u in range(30):
        for i in rng.choice(n_items, size=12, replace=False):
            rows.append((u, int(i), float(good[i])))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])
    item_feats = pd.DataFrame({
        "item_id": np.arange(n_items),
        "quality": good,
        "color": np.where(good > 0, "green", "red"),
    })
    schema = FeatureSchema(
        [
            FeatureInfo("user_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.QUERY_ID),
            FeatureInfo("item_id", FeatureType.CATEGORICAL, feature_hint=FeatureHint.ITEM_ID),
            FeatureInfo("rating", FeatureType.NUMERICAL, feature_hint=FeatureHint.RATING,
                        feature_source=FeatureSource.INTERACTIONS),
            FeatureInfo("quality", FeatureType.NUMERICAL, feature_source=FeatureSource.ITEM_FEATURES),
            FeatureInfo("color", FeatureType.CATEGORICAL, feature_source=FeatureSource.ITEM_FEATURES),
        ]
    )
    ds = Dataset(schema, df, item_features=item_feats)
    # MC-dropout exploration (reference predict_test: mean + coef·std) with
    # the reference's WARP loss
    model = NeuralTS(embedding_dim=8, phi_dim=8, epochs=40, seed=0,
                     exploration="dropout", loss="warp", head_dropout=0.2,
                     deep_dropout=0.1, exploration_coef=0.1,
                     cnt_neg_samples=20)
    model.fit(ds)
    assert model._item_feats.shape == (n_items, 3)  # quality + onehot(color)×2
    scores = model._score_block(np.arange(30), np.arange(n_items), ds)
    assert scores[:, ::2].mean() > scores[:, 1::2].mean() + 0.5

    # feature-less mode still works
    plain = NeuralTS(embedding_dim=8, phi_dim=8, epochs=2, seed=0, use_features=False)
    plain.fit(ds)
    assert plain._item_feats.shape[1] == 0


def test_sequence_generator_cross_group_orderby():
    """Windows must stay attached to THEIR group's rows even when
    orderby_column interleaves groups (Spark-window semantics; the
    reference's pandas backend scrambles this case — round-3 review)."""
    from replay_tpu.experimental.preprocessing import SequenceGenerator

    df = pd.DataFrame(
        {
            "user_id": [1, 2, 1, 2],
            "item_id": [10, 20, 11, 21],
            "timestamp": [0, 1, 2, 3],
        }
    )
    out = SequenceGenerator(
        groupby_column="user_id", orderby_column="timestamp",
        transform_columns="item_id",
    ).transform(df)
    by_user = {
        (u, lab): win
        for u, win, lab in zip(out["user_id"], out["item_id_list"], out["label_item_id"])
    }
    assert by_user[(1, 11)] == [10]
    assert by_user[(2, 21)] == [20]
    assert len(out) == 2


def test_padder_minus_one_non_list_cells():
    from replay_tpu.experimental.preprocessing import Padder

    df = pd.DataFrame({"seq": [None, [1, 2], 5]})
    out = Padder("seq", padding_value=0, array_size=-1).transform(df)
    assert out["seq"].tolist() == [[0, 0], [1, 2], [0, 0]]
