"""Reference import-surface parity: a user porting from the reference
(sb-ai-lab/RePlay) must find the same public names at the same paths
(reference: replay/*/__init__.py export lists)."""

import numpy as np
import pandas as pd
import pytest


def test_utils_flags_and_types():
    from replay_tpu.utils import (
        ANN_AVAILABLE,
        LIGHTFM_AVAILABLE,
        OBP_AVAILABLE,
        OPENVINO_AVAILABLE,
        PYSPARK_AVAILABLE,
        FeatureUnavailableError,
        FeatureUnavailableWarning,
        IntOrList,
        NumType,
        SparkDataFrame,
    )

    assert ANN_AVAILABLE is True  # in-tree C++ HNSW
    assert PYSPARK_AVAILABLE is False
    assert OPENVINO_AVAILABLE is True  # StableHLO AOT export
    assert isinstance(LIGHTFM_AVAILABLE, bool)
    assert isinstance(OBP_AVAILABLE, bool)
    assert issubclass(FeatureUnavailableError, Exception)
    assert issubclass(FeatureUnavailableWarning, Warning)
    assert IntOrList is not None and NumType is not None
    with pytest.raises(ImportError):
        SparkDataFrame()


def test_models_nn_alias_package():
    from replay_tpu.models.nn import Bert4Rec, SasRec, TiSasRec, TwoTower
    from replay_tpu.nn.sequential import SasRec as CanonicalSasRec

    assert SasRec is CanonicalSasRec
    assert all(c is not None for c in (Bert4Rec, TiSasRec, TwoTower))


def test_data_nn_surface():
    from replay_tpu.data import get_schema
    from replay_tpu.data.nn import (
        DEFAULT_GROUND_TRUTH_PADDING_VALUE,
        DEFAULT_TRAIN_PADDING_VALUE,
        MutableTensorMap,
        PandasSequentialDataset,
        ParquetDataset,
        ParquetModule,
        SequentialDataset,
        TensorMap,
    )

    assert DEFAULT_GROUND_TRUTH_PADDING_VALUE == -1
    assert DEFAULT_TRAIN_PADDING_VALUE == -2
    assert PandasSequentialDataset is SequentialDataset
    assert callable(get_schema)
    assert ParquetDataset is not None and ParquetModule is not None
    assert TensorMap is not None and MutableTensorMap is not None


def test_preprocessing_surface():
    from replay_tpu.preprocessing import (
        ConditionalPopularityProcessor,
        EmptyFeatureProcessor,
        HandleInvalidStrategies,
        LogStatFeaturesProcessor,
    )

    assert issubclass(LogStatFeaturesProcessor, EmptyFeatureProcessor)
    assert issubclass(ConditionalPopularityProcessor, EmptyFeatureProcessor)
    assert HandleInvalidStrategies is not None
    log = pd.DataFrame({"query_id": [1], "item_id": [2]})
    fp = EmptyFeatureProcessor()
    fp.fit(log, None)
    pd.testing.assert_frame_equal(fp.transform(log), log)


def test_experimental_metrics_package():
    from replay_tpu.experimental.metrics import (
        MAP,
        NDCG,
        HitRate,
        Metric,
        NCISMetric,
        NCISPrecision,
    )
    from replay_tpu.metrics import NDCG as MainNDCG

    assert NDCG is MainNDCG  # single vectorized data plane serves both tiers
    assert issubclass(NCISPrecision, NCISMetric)
    assert issubclass(NCISMetric, Metric)
    assert MAP is not None and HitRate is not None


class TestIndexer:
    def _fitted(self):
        from replay_tpu.experimental.preprocessing import Indexer

        users = pd.DataFrame({"user_id": ["u3", "u1", "u2"]})
        items = pd.DataFrame({"item_id": [30, 10, 20]})
        idx = Indexer()
        idx.fit(users, items)
        return idx

    def test_transform_inverse_roundtrip(self):
        idx = self._fitted()
        log = pd.DataFrame(
            {"user_id": ["u1", "u2", "u3"], "item_id": [10, 20, 30], "r": [1.0, 2.0, 3.0]}
        )
        enc = idx.transform(log)
        assert {"user_idx", "item_idx"} <= set(enc.columns)
        assert enc["user_idx"].dtype == np.int32
        assert "user_id" not in enc.columns
        back = idx.inverse_transform(enc)
        pd.testing.assert_frame_equal(
            back[["user_id", "item_id", "r"]], log[["user_id", "item_id", "r"]]
        )

    def test_unseen_ids_extend_mapping(self):
        # reference _reindex contract (data_preparator.py:146): transform
        # grows the label set instead of failing on new entities
        idx = self._fitted()
        log = pd.DataFrame({"user_id": ["u9"], "item_id": [99]})
        enc = idx.transform(log)
        assert enc["user_idx"].iloc[0] == 3
        assert enc["item_idx"].iloc[0] == 3
        back = idx.inverse_transform(enc)
        assert back["user_id"].iloc[0] == "u9"
        assert back["item_id"].iloc[0] == 99

    def test_partial_columns(self):
        idx = self._fitted()
        only_items = pd.DataFrame({"item_id": [20, 10]})
        enc = idx.transform(only_items)
        assert list(enc["item_idx"]) == [2, 1]
        assert "user_idx" not in enc.columns


def test_ncis_precision_still_computes():
    from replay_tpu.metrics import NCISPrecision

    prev = pd.DataFrame(
        {"query_id": [1, 1], "item_id": [10, 20], "rating": [1.0, 1.0]}
    )
    recs = pd.DataFrame(
        {"query_id": [1, 1], "item_id": [10, 20], "rating": [0.9, 0.1]}
    )
    gt = pd.DataFrame({"query_id": [1], "item_id": [10]})
    out = NCISPrecision(topk=2, prev_policy_weights=prev)(recs, gt)
    # weights are 0.9 and 0.1 (prev=1), hit only on item 10
    assert abs(out["NCISPrecision@2"] - 0.9) < 1e-9


def test_indexer_save_load_roundtrip(tmp_path):
    """reference: tests/experimental/utils/test_save_load_indexer.py +
    replay/experimental/utils/model_handler.py:123,155."""
    from replay_tpu.experimental.preprocessing import Indexer
    from replay_tpu.experimental.utils import load_indexer, save_indexer

    users = pd.DataFrame({"user_id": ["b", "a", "c"]})
    items = pd.DataFrame({"item_id": [5, 3, 9]})
    idx = Indexer()
    idx.fit(users, items)
    save_indexer(idx, tmp_path / "ind", overwrite=True)
    with pytest.raises(FileExistsError):
        save_indexer(idx, tmp_path / "ind")
    restored = load_indexer(tmp_path / "ind")
    log = pd.DataFrame({"user_id": ["a", "c"], "item_id": [9, 3]})
    pd.testing.assert_frame_equal(idx.transform(log), restored.transform(log))
    back = restored.inverse_transform(restored.transform(log))
    pd.testing.assert_frame_equal(back[["user_id", "item_id"]], log)
