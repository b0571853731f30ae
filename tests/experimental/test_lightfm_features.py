"""LightFMWrap feature-matrix construction (no lightfm needed).

The reference builds [one-hot fit-entity identity | MinMaxScaler features]
row-normalized to sum 1 (reference:
replay/experimental/models/lightfm_wrap.py:64-160); that construction is
pure scipy/sklearn, so it is pinned here even though the lightfm training
path needs the optional C extension.
"""

import pytest as _pytest

pytestmark = _pytest.mark.experimental

import numpy as np
import pandas as pd
import pytest

from replay_tpu.experimental.models.lightfm_wrap import LIGHTFM_AVAILABLE, LightFMWrap


def _bare_wrap():
    # bypass the ctor's import guard — only the csr helper is under test
    m = LightFMWrap.__new__(LightFMWrap)
    m.user_feat_scaler = None
    m.item_feat_scaler = None
    m.query_column = "user_id"
    m.item_column = "item_id"
    m.fit_queries = np.array([10, 20, 30])
    m.fit_items = np.array([1, 2, 3, 4])
    return m


def test_ctor_raises_without_lightfm():
    if LIGHTFM_AVAILABLE:
        pytest.skip("lightfm installed")
    with pytest.raises(ImportError, match="pip install lightfm"):
        LightFMWrap()


def test_feature_csr_identity_and_scaling():
    m = _bare_wrap()
    feats = pd.DataFrame({"user_id": [10, 20, 30], "age": [0.0, 5.0, 10.0]})
    mat = m._feature_table_to_csr("user", np.array([10, 20, 30]), feats)
    dense = np.asarray(mat.todense())
    assert dense.shape == (3, 4)  # 3 fit users one-hot + 1 feature col
    # rows sum to 1 (reference row normalization)
    np.testing.assert_allclose(dense.sum(axis=1), 1.0)
    # MinMaxScaler: ages 0/5/10 → 0/0.5/1 before normalization
    raw_feature = dense[:, 3] * dense.sum(axis=1)  # post-norm value
    # row0: identity 1 + feature 0  → feature share 0
    assert dense[0, 0] > 0 and dense[0, 3] == 0
    # row2: identity 1 + feature 1 → each 0.5 after normalization
    np.testing.assert_allclose(dense[2, [2, 3]], 0.5)
    assert raw_feature[1] == pytest.approx(dense[1, 3])


def test_feature_csr_cold_rows_use_features_only():
    m = _bare_wrap()
    feats = pd.DataFrame({"user_id": [10, 20, 30, 99], "age": [0.0, 5.0, 10.0, 10.0]})
    mat = m._feature_table_to_csr("user", np.array([10, 99]), feats)
    dense = np.asarray(mat.todense())
    # cold user 99: no identity column, only the scaled feature, normalized
    assert dense[1, :3].sum() == 0
    assert dense[1, 3] == pytest.approx(1.0)
    # scaler was fit on the provided rows and is reused on later calls
    assert m.user_feat_scaler is not None
    mat2 = m._feature_table_to_csr("user", np.array([20]), feats)
    assert np.asarray(mat2.todense())[0, 1] > 0


def test_feature_csr_missing_features_error():
    m = _bare_wrap()
    feats = pd.DataFrame({"user_id": [99], "age": [np.nan]})
    with pytest.raises(ValueError, match="absent"):
        m._feature_table_to_csr("user", np.array([99]), feats)


def test_feature_csr_non_numeric_error():
    m = _bare_wrap()
    feats = pd.DataFrame({"user_id": [10], "name": ["a"]})
    with pytest.raises(ValueError, match="numeric"):
        m._feature_table_to_csr("user", np.array([10]), feats)


def test_feature_csr_none_passthrough():
    m = _bare_wrap()
    assert m._feature_table_to_csr("user", np.array([10]), None) is None
