import pytest as _pytest

pytestmark = _pytest.mark.core

import numpy as np
import pandas as pd
import pytest

from replay_tpu.preprocessing import (
    LabelEncoder,
    LabelEncoderPartialFitWarning,
    LabelEncoderTransformWarning,
    LabelEncodingRule,
    SequenceEncodingRule,
)


class TestLabelEncodingRule:
    def test_fit_transform_sorted_rank(self):
        df = pd.DataFrame({"x": ["c", "a", "b", "a"]})
        rule = LabelEncodingRule("x").fit(df)
        assert rule.get_mapping() == {"a": 0, "b": 1, "c": 2}
        out = rule.transform(df)
        assert out["x"].tolist() == [2, 0, 1, 0]

    def test_inverse_transform_roundtrip(self):
        df = pd.DataFrame({"x": ["c", "a", "b"]})
        rule = LabelEncodingRule("x").fit(df)
        out = rule.inverse_transform(rule.transform(df))
        assert out["x"].tolist() == ["c", "a", "b"]

    def test_partial_fit_appends(self):
        df = pd.DataFrame({"x": ["a", "b"]})
        rule = LabelEncodingRule("x").fit(df)
        rule.partial_fit(pd.DataFrame({"x": ["c", "a"]}))
        assert rule.get_mapping()["c"] == 2

    def test_partial_fit_no_new_warns(self):
        df = pd.DataFrame({"x": ["a", "b"]})
        rule = LabelEncodingRule("x").fit(df)
        with pytest.warns(LabelEncoderPartialFitWarning):
            rule.partial_fit(df)

    def test_unknown_error(self):
        rule = LabelEncodingRule("x").fit(pd.DataFrame({"x": ["a"]}))
        with pytest.raises(ValueError):
            rule.transform(pd.DataFrame({"x": ["zzz"]}))

    def test_unknown_drop(self):
        rule = LabelEncodingRule("x", handle_unknown="drop").fit(pd.DataFrame({"x": ["a"]}))
        with pytest.warns(LabelEncoderTransformWarning):
            out = rule.transform(pd.DataFrame({"x": ["zzz"]}))
        assert len(out) == 0

    def test_unknown_default_value(self):
        rule = LabelEncodingRule(
            "x", handle_unknown="use_default_value", default_value=-1
        ).fit(pd.DataFrame({"x": ["a"]}))
        with pytest.warns(LabelEncoderTransformWarning):
            out = rule.transform(pd.DataFrame({"x": ["zzz", "a"]}))
        assert out["x"].tolist() == [-1, 0]

    def test_unknown_default_last(self):
        rule = LabelEncodingRule(
            "x", handle_unknown="use_default_value", default_value="last"
        ).fit(pd.DataFrame({"x": ["a", "b"]}))
        with pytest.warns(LabelEncoderTransformWarning):
            out = rule.transform(pd.DataFrame({"x": ["zzz"]}))
        assert out["x"].tolist() == [2]

    def test_prefitted_mapping(self):
        rule = LabelEncodingRule("x", mapping={"a": 5, "b": 7})
        out = rule.transform(pd.DataFrame({"x": ["b", "a"]}))
        assert out["x"].tolist() == [7, 5]

    def test_save_load(self, tmp_path):
        rule = LabelEncodingRule("x").fit(pd.DataFrame({"x": ["a", "b"]}))
        rule.save(str(tmp_path / "rule"))
        loaded = LabelEncodingRule.load(str(tmp_path / "rule"))
        assert loaded.get_mapping() == rule.get_mapping()


class TestSequenceEncodingRule:
    def test_fit_transform(self):
        df = pd.DataFrame({"s": [[3, 1], [2, 3]]})
        rule = SequenceEncodingRule("s").fit(df)
        assert rule.get_mapping() == {1: 0, 2: 1, 3: 2}
        out = rule.transform(df)
        assert out["s"].tolist() == [[2, 0], [1, 2]]

    def test_inverse(self):
        df = pd.DataFrame({"s": [[3, 1], [2, 3]]})
        rule = SequenceEncodingRule("s").fit(df)
        out = rule.inverse_transform(rule.transform(df))
        assert out["s"].tolist() == [[3, 1], [2, 3]]

    def test_unknown_drop_in_sequence(self):
        rule = SequenceEncodingRule("s", handle_unknown="drop").fit(
            pd.DataFrame({"s": [[1, 2]]})
        )
        with pytest.warns(LabelEncoderTransformWarning):
            out = rule.transform(pd.DataFrame({"s": [[1, 99]]}))
        assert out["s"].tolist() == [[0]]


class TestLabelEncoder:
    def test_multi_rule(self):
        df = pd.DataFrame({"u": ["b", "a"], "i": [20, 10]})
        enc = LabelEncoder([LabelEncodingRule("u"), LabelEncodingRule("i")])
        out = enc.fit_transform(df)
        assert out["u"].tolist() == [1, 0]
        assert out["i"].tolist() == [1, 0]
        assert enc.mapping == {"u": {"a": 0, "b": 1}, "i": {10: 0, 20: 1}}

    def test_set_handle_unknowns(self):
        df = pd.DataFrame({"u": ["a"]})
        enc = LabelEncoder([LabelEncodingRule("u")]).fit(df)
        enc.set_handle_unknowns({"u": "use_default_value"})
        enc.set_default_values({"u": "last"})
        with pytest.warns(LabelEncoderTransformWarning):
            out = enc.transform(pd.DataFrame({"u": ["new"]}))
        assert out["u"].tolist() == [1]

    def test_save_load(self, tmp_path):
        df = pd.DataFrame({"u": ["a", "b"], "s": [[1], [2]]})
        enc = LabelEncoder([LabelEncodingRule("u"), SequenceEncodingRule("s")]).fit(df)
        enc.save(str(tmp_path / "enc"))
        loaded = LabelEncoder.load(str(tmp_path / "enc"))
        assert loaded.mapping == enc.mapping
        assert isinstance(loaded.rules[1], SequenceEncodingRule)
