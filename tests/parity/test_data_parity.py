"""Splitters / LabelEncoder / filters vs the reference pandas backend."""

import numpy as np
import pandas as pd
import pytest


def _assert_frames_equal(mine, ref, msg=""):
    mine = mine.sort_values(list(mine.columns)).reset_index(drop=True)
    ref = ref.sort_values(list(ref.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False, obj=msg or "frame")


class TestSplittersParity:
    @pytest.mark.parametrize("ratio", [0.2, 0.5])
    @pytest.mark.parametrize("divide", [True, False])
    def test_ratio_splitter(self, reference, random_log, ratio, divide):
        from replay.splitters import RatioSplitter as Ref

        from replay_tpu.splitters import RatioSplitter as Mine

        kwargs = dict(
            test_size=ratio, divide_column="query_id", query_column="query_id",
            item_column="item_id", timestamp_column="timestamp",
            drop_cold_items=divide, drop_cold_users=divide,
        )
        mtr, mte = Mine(**kwargs).split(random_log)
        rtr, rte = Ref(**kwargs).split(random_log)
        _assert_frames_equal(mtr, rtr, "ratio train")
        _assert_frames_equal(mte, rte, "ratio test")

    @pytest.mark.parametrize("time_threshold", [0.3, 0.7])
    def test_time_splitter(self, reference, random_log, time_threshold):
        from replay.splitters import TimeSplitter as Ref

        from replay_tpu.splitters import TimeSplitter as Mine

        kwargs = dict(
            time_threshold=time_threshold, query_column="query_id",
            item_column="item_id", timestamp_column="timestamp",
        )
        mtr, mte = Mine(**kwargs).split(random_log)
        rtr, rte = Ref(**kwargs).split(random_log)
        _assert_frames_equal(mtr, rtr, "time train")
        _assert_frames_equal(mte, rte, "time test")

    @pytest.mark.parametrize("n", [1, 3])
    def test_last_n_splitter(self, reference, random_log, n):
        from replay.splitters import LastNSplitter as Ref

        from replay_tpu.splitters import LastNSplitter as Mine

        kwargs = dict(
            N=n, divide_column="query_id", query_column="query_id",
            item_column="item_id", timestamp_column="timestamp", strategy="interactions",
        )
        mtr, mte = Mine(**kwargs).split(random_log)
        rtr, rte = Ref(**kwargs).split(random_log)
        _assert_frames_equal(mtr, rtr, "lastn train")
        _assert_frames_equal(mte, rte, "lastn test")


class TestLabelEncoderParity:
    def test_fit_transform_inverse(self, reference, random_log):
        from replay.preprocessing import LabelEncoder as RefEnc
        from replay.preprocessing import LabelEncodingRule as RefRule

        from replay_tpu.preprocessing import LabelEncoder as MyEnc
        from replay_tpu.preprocessing import LabelEncodingRule as MyRule

        log = random_log.copy()
        log["query_id"] = "u" + log["query_id"].astype(str)
        mine = MyEnc([MyRule("query_id"), MyRule("item_id")])
        ref = RefEnc([RefRule("query_id"), RefRule("item_id")])
        mt = mine.fit_transform(log)
        rt = ref.fit_transform(log)
        # the reference reorders columns (encoded last); align before comparing
        pd.testing.assert_frame_equal(
            mt.reset_index(drop=True), rt[mt.columns].reset_index(drop=True),
            check_dtype=False,
        )
        # inverse round-trips identically
        mi = mine.inverse_transform(mt).reset_index(drop=True)
        ri = ref.inverse_transform(rt).reset_index(drop=True)
        pd.testing.assert_frame_equal(mi, ri[mi.columns], check_dtype=False)

    def test_partial_fit_and_unknown(self, reference, random_log):
        """The reference assigns NEW partial_fit ids in python set-iteration
        (hash) order (label_encoder.py:258-267) — arbitrary by construction
        and different even between its own pandas/polars backends.  The
        portable contract checked here: ids from the initial fit are
        preserved verbatim, new values fill the same contiguous id range,
        and inverse_transform round-trips."""
        from replay.preprocessing import LabelEncoder as RefEnc
        from replay.preprocessing import LabelEncodingRule as RefRule

        from replay_tpu.preprocessing import LabelEncoder as MyEnc
        from replay_tpu.preprocessing import LabelEncodingRule as MyRule

        head, tail = random_log.iloc[:2000], random_log.iloc[2000:]
        mine = MyEnc([MyRule("item_id", handle_unknown="use_default_value", default_value=-1)])
        ref = RefEnc([RefRule("item_id", handle_unknown="use_default_value", default_value=-1)])
        mine.fit(head)
        ref.fit(head)
        assert mine.mapping["item_id"] == ref.mapping["item_id"]
        mine.partial_fit(tail)
        ref.partial_fit(tail)
        m_map, r_map = mine.mapping["item_id"], ref.mapping["item_id"]
        assert set(m_map) == set(r_map)
        assert sorted(m_map.values()) == sorted(r_map.values())
        # ids assigned by the initial fit never change
        fitted = set(head["item_id"])
        assert {k: v for k, v in m_map.items() if k in fitted} == {
            k: v for k, v in r_map.items() if k in fitted
        }
        # both round-trip
        out_m = mine.transform(random_log)
        back = mine.inverse_transform(out_m)
        pd.testing.assert_frame_equal(
            back.reset_index(drop=True), random_log.reset_index(drop=True),
            check_dtype=False,
        )


class TestFiltersParity:
    def test_min_count_filter(self, reference, random_log):
        from replay.preprocessing.filters import MinCountFilter as Ref

        from replay_tpu.preprocessing.filters import MinCountFilter as Mine

        m = Mine(num_entries=5, groupby_column="query_id").transform(random_log)
        r = Ref(num_entries=5, groupby_column="query_id").transform(random_log)
        _assert_frames_equal(m, r, "min count")

    def test_low_rating_filter(self, reference, random_log):
        from replay.preprocessing.filters import LowRatingFilter as Ref

        from replay_tpu.preprocessing.filters import LowRatingFilter as Mine

        m = Mine(value=3.0).transform(random_log)
        r = Ref(value=3.0).transform(random_log)
        _assert_frames_equal(m, r, "low rating")

    def test_num_interactions_filter(self, reference, random_log):
        from replay.preprocessing.filters import NumInteractionsFilter as Ref

        from replay_tpu.preprocessing.filters import NumInteractionsFilter as Mine

        kwargs = dict(num_interactions=6, first=True, query_column="query_id",
                      item_column="item_id", timestamp_column="timestamp")
        m = Mine(**kwargs).transform(random_log)
        r = Ref(**kwargs).transform(random_log)
        _assert_frames_equal(m, r, "num interactions")

    def test_quantile_items_filter(self, reference, random_log):
        from replay.preprocessing.filters import QuantileItemsFilter as Ref

        from replay_tpu.preprocessing.filters import QuantileItemsFilter as Mine

        kwargs = dict(alpha_quantile=0.95, query_column="query_id", item_column="item_id")
        m = Mine(**kwargs).transform(random_log)
        r = Ref(**kwargs).transform(random_log)
        _assert_frames_equal(m, r, "quantile items")

    def test_entity_days_filter(self, reference, random_log):
        from replay.preprocessing.filters import EntityDaysFilter as Ref

        from replay_tpu.preprocessing.filters import EntityDaysFilter as Mine

        log = random_log.copy()
        log["timestamp"] = pd.to_datetime(log["timestamp"], unit="s")
        kwargs = dict(days=2, first=True, entity_column="query_id", timestamp_column="timestamp")
        m = Mine(**kwargs).transform(log)
        r = Ref(**kwargs).transform(log)
        _assert_frames_equal(m, r, "entity days")
