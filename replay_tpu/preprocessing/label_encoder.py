"""Label encoding: contiguous integer ids for categorical columns.

Re-implements the reference contract (reference:
replay/preprocessing/label_encoder.py:86-900) on a single pandas/numpy code
path: fit sorts distinct values and assigns ranks; partial_fit appends new
values after the current max id; unknowns are handled by one of
{"error", "use_default_value", "drop"}.  Encoding itself is vectorized with
pandas factorize/map rather than per-row Python loops.
"""

import abc
import json
import pickle
import warnings
from pathlib import Path
from typing import Dict, List, Mapping, Optional, Sequence, Union

import numpy as np
import pandas as pd

HandleUnknownStrategies = str


class LabelEncoderTransformWarning(Warning):
    """Unknown labels encountered during transform."""


class LabelEncoderPartialFitWarning(Warning):
    """partial_fit saw no new values."""


class BaseLabelEncodingRule(abc.ABC):
    """Interface for one-column encoding rules."""

    @property
    @abc.abstractmethod
    def column(self) -> str: ...

    @abc.abstractmethod
    def get_mapping(self) -> Mapping: ...

    @abc.abstractmethod
    def get_inverse_mapping(self) -> Mapping: ...

    @abc.abstractmethod
    def fit(self, df: pd.DataFrame) -> "BaseLabelEncodingRule": ...

    @abc.abstractmethod
    def partial_fit(self, df: pd.DataFrame) -> "BaseLabelEncodingRule": ...

    @abc.abstractmethod
    def transform(self, df: pd.DataFrame) -> pd.DataFrame: ...

    @abc.abstractmethod
    def inverse_transform(self, df: pd.DataFrame) -> pd.DataFrame: ...

    @abc.abstractmethod
    def set_default_value(self, default_value: Optional[Union[int, str]]) -> None: ...

    @abc.abstractmethod
    def set_handle_unknown(self, handle_unknown: HandleUnknownStrategies) -> None: ...


class LabelEncodingRule(BaseLabelEncodingRule):
    """Encode one scalar column to 0..n_classes-1."""

    _HANDLE_UNKNOWN_STRATEGIES = ("error", "use_default_value", "drop")

    def __init__(
        self,
        column: str,
        mapping: Optional[Mapping] = None,
        handle_unknown: HandleUnknownStrategies = "error",
        default_value: Optional[Union[int, str]] = None,
    ):
        if handle_unknown not in self._HANDLE_UNKNOWN_STRATEGIES:
            msg = (
                "handle_unknown should be one of "
                f"{self._HANDLE_UNKNOWN_STRATEGIES}, got {handle_unknown}."
            )
            raise ValueError(msg)
        self._handle_unknown = handle_unknown
        if (
            handle_unknown == "use_default_value"
            and default_value is not None
            and not isinstance(default_value, int)
            and default_value != "last"
        ):
            msg = "Default value should be None, int or 'last'"
            raise ValueError(msg)
        self._default_value = default_value
        self._col = column
        self._mapping: Optional[Dict] = dict(mapping) if mapping is not None else None
        self._is_fitted = self._mapping is not None

    @property
    def column(self) -> str:
        return self._col

    def get_mapping(self) -> Mapping:
        if self._mapping is None:
            msg = "Label encoder is not fitted"
            raise RuntimeError(msg)
        return self._mapping

    def get_inverse_mapping(self) -> Mapping:
        return {v: k for k, v in self.get_mapping().items()}

    # -- fitting ---------------------------------------------------------------
    def _unique_values(self, df: pd.DataFrame) -> np.ndarray:
        return pd.unique(df[self._col].to_numpy())

    def fit(self, df: pd.DataFrame) -> "LabelEncodingRule":
        if self._mapping is not None:
            return self
        uniq = np.sort(self._unique_values(df))
        self._mapping = {val: idx for idx, val in enumerate(uniq.tolist())}
        if self._handle_unknown == "use_default_value" and self._default_value in set(
            self._mapping.values()
        ):
            msg = (
                f"default_value {self._default_value} collides with an id already "
                "used for a seen label."
            )
            raise ValueError(msg)
        self._is_fitted = True
        return self

    def partial_fit(self, df: pd.DataFrame) -> "LabelEncodingRule":
        if self._mapping is None:
            return self.fit(df)
        new_values = [v for v in pd.unique(df[self._col].to_numpy()).tolist() if v not in self._mapping]
        if not new_values:
            warnings.warn(
                "partial_fit will have no effect because there are no new values "
                f"in the incoming dataset at '{self._col}' column",
                LabelEncoderPartialFitWarning,
            )
            return self
        start = max(self._mapping.values()) + 1
        for i, v in enumerate(new_values):
            self._mapping[v] = start + i
        self._is_fitted = True
        return self

    # -- transform ----------------------------------------------------------------
    def _resolved_default(self) -> Optional[int]:
        if self._default_value == "last":
            return len(self.get_mapping())
        return self._default_value  # type: ignore[return-value]

    def _encode_series(self, series: pd.Series) -> pd.Series:
        mapping = self.get_mapping()
        return series.map(mapping)

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        encoded = self._encode_series(df[self._col])
        unknown_mask = encoded.isna()
        out = df.copy()
        if bool(unknown_mask.any()):
            if self._handle_unknown == "error":
                unknown = pd.unique(df.loc[unknown_mask, self._col])
                msg = f"Found unknown labels in column '{self._col}' during transform: {list(unknown[:10])}"
                raise ValueError(msg)
            if self._handle_unknown == "drop":
                if bool(unknown_mask.all()):
                    warnings.warn(
                        f"You are trying to transform dataframe with all values are unknown for {self._col}, "
                        "with `handle_unknown_strategy=drop` leads to empty dataframe",
                        LabelEncoderTransformWarning,
                    )
                out = out.loc[~unknown_mask].copy()
                encoded = encoded.loc[~unknown_mask]
            else:  # use_default_value
                warnings.warn(
                    f"Unknown labels in column '{self._col}' were encoded with the default value",
                    LabelEncoderTransformWarning,
                )
                default = self._resolved_default()
                if default is not None:
                    encoded = encoded.fillna(default)
        if encoded.isna().any():
            out[self._col] = encoded.to_numpy()
        else:
            out[self._col] = encoded.astype(np.int64).to_numpy()
        return out

    def inverse_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        inv = self.get_inverse_mapping()
        out = df.copy()
        out[self._col] = df[self._col].map(inv).to_numpy()
        return out

    # -- config ---------------------------------------------------------------------
    def set_default_value(self, default_value: Optional[Union[int, str]]) -> None:
        if default_value is not None and not isinstance(default_value, int) and default_value != "last":
            msg = "Default value should be None, int or 'last'"
            raise ValueError(msg)
        self._default_value = default_value

    def set_handle_unknown(self, handle_unknown: HandleUnknownStrategies) -> None:
        if handle_unknown not in self._HANDLE_UNKNOWN_STRATEGIES:
            msg = f"handle_unknown should be one of {self._HANDLE_UNKNOWN_STRATEGIES}"
            raise ValueError(msg)
        self._handle_unknown = handle_unknown

    # -- persistence -------------------------------------------------------------------
    def save(self, path: str) -> None:
        base = Path(path).with_suffix(".replay").resolve()
        base.mkdir(parents=True, exist_ok=True)
        meta = {
            "_class_name": type(self).__name__,
            "column": self._col,
            "handle_unknown": self._handle_unknown,
            "default_value": self._default_value,
        }
        (base / "init_args.json").write_text(json.dumps(meta))
        with open(base / "mapping.pkl", "wb") as fh:
            pickle.dump(self._mapping, fh)

    @classmethod
    def load(cls, path: str) -> "LabelEncodingRule":
        base = Path(path)
        if base.suffix != ".replay":
            base = base.with_suffix(".replay")
        meta = json.loads((base / "init_args.json").read_text())
        with open(base / "mapping.pkl", "rb") as fh:
            mapping = pickle.load(fh)
        rule = cls(
            column=meta["column"],
            mapping=mapping,
            handle_unknown=meta["handle_unknown"],
            default_value=meta["default_value"],
        )
        return rule


class SequenceEncodingRule(LabelEncodingRule):
    """Encode a column whose cells are lists/arrays of categorical values."""

    def _unique_values(self, df: pd.DataFrame) -> np.ndarray:
        flat = np.concatenate([np.asarray(cell) for cell in df[self._col]]) if len(df) else np.array([])
        return pd.unique(flat)

    def partial_fit(self, df: pd.DataFrame) -> "SequenceEncodingRule":
        if self._mapping is None:
            return self.fit(df)  # type: ignore[return-value]
        new_values = [v for v in pd.unique(self._unique_values(df)).tolist() if v not in self._mapping]
        if not new_values:
            warnings.warn(
                "partial_fit will have no effect because there are no new values "
                f"in the incoming dataset at '{self._col}' column",
                LabelEncoderPartialFitWarning,
            )
            return self
        start = max(self._mapping.values()) + 1
        for i, v in enumerate(new_values):
            self._mapping[v] = start + i
        return self

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        mapping = self.get_mapping()
        out = df.copy()
        has_unknown = False
        default = self._resolved_default()

        def encode_cell(cell):
            nonlocal has_unknown
            vals = []
            for v in cell:
                code = mapping.get(v)
                if code is None:
                    has_unknown = True
                    if self._handle_unknown == "drop":
                        continue
                    if self._handle_unknown == "error":
                        msg = f"Found unknown label {v!r} in sequence column '{self._col}'"
                        raise ValueError(msg)
                    code = default
                vals.append(code)
            return vals

        out[self._col] = [encode_cell(cell) for cell in df[self._col]]
        if has_unknown and self._handle_unknown != "error":
            warnings.warn(
                f"Unknown labels in sequence column '{self._col}' handled by "
                f"strategy '{self._handle_unknown}'",
                LabelEncoderTransformWarning,
            )
        if self._handle_unknown == "drop":
            lengths = out[self._col].map(len)
            if (lengths == 0).all() and len(out):
                warnings.warn(
                    f"All sequences became empty after dropping unknown labels in '{self._col}'",
                    LabelEncoderTransformWarning,
                )
            out = out[lengths > 0].copy()
        return out

    def inverse_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        inv = self.get_inverse_mapping()
        out = df.copy()
        out[self._col] = [[inv[v] for v in cell] for cell in df[self._col]]
        return out


class LabelEncoder:
    """Apply a sequence of encoding rules to a dataframe.

    >>> import pandas as pd
    >>> df = pd.DataFrame({"user_id": ["u1", "u2", "u1"], "item_id": [10, 30, 20]})
    >>> enc = LabelEncoder([LabelEncodingRule("user_id"), LabelEncodingRule("item_id")])
    >>> enc.fit_transform(df)
       user_id  item_id
    0        0        0
    1        1        2
    2        0        1
    """

    def __init__(self, rules: Sequence[BaseLabelEncodingRule]):
        self.rules = list(rules)

    @property
    def mapping(self) -> Dict[str, Mapping]:
        return {r.column: r.get_mapping() for r in self.rules}

    @property
    def inverse_mapping(self) -> Dict[str, Mapping]:
        return {r.column: r.get_inverse_mapping() for r in self.rules}

    def fit(self, df: pd.DataFrame) -> "LabelEncoder":
        for rule in self.rules:
            rule.fit(df)
        return self

    def partial_fit(self, df: pd.DataFrame) -> "LabelEncoder":
        for rule in self.rules:
            rule.partial_fit(df)
        return self

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        for rule in self.rules:
            df = rule.transform(df)
        return df

    def inverse_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        for rule in self.rules:
            df = rule.inverse_transform(df)
        return df

    def fit_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        return self.fit(df).transform(df)

    def set_default_values(self, default_value_rules: Dict[str, Optional[Union[int, str]]]) -> None:
        by_col = {r.column: r for r in self.rules}
        for col, value in default_value_rules.items():
            if col not in by_col:
                msg = f"No encoding rule for column '{col}'."
                raise ValueError(msg)
            by_col[col].set_default_value(value)

    def set_handle_unknowns(self, handle_unknown_rules: Dict[str, HandleUnknownStrategies]) -> None:
        by_col = {r.column: r for r in self.rules}
        for col, strategy in handle_unknown_rules.items():
            if col not in by_col:
                msg = f"No encoding rule for column '{col}'."
                raise ValueError(msg)
            by_col[col].set_handle_unknown(strategy)

    def save(self, path: str) -> None:
        base = Path(path).with_suffix(".replay").resolve()
        base.mkdir(parents=True, exist_ok=True)
        (base / "init_args.json").write_text(
            json.dumps({"_class_name": "LabelEncoder", "n_rules": len(self.rules)})
        )
        for i, rule in enumerate(self.rules):
            rule.save(str(base / f"rule_{i}"))  # type: ignore[attr-defined]
            (base / f"rule_{i}.type").write_text(type(rule).__name__)

    @classmethod
    def load(cls, path: str) -> "LabelEncoder":
        base = Path(path)
        if base.suffix != ".replay":
            base = base.with_suffix(".replay")
        meta = json.loads((base / "init_args.json").read_text())
        rules: List[BaseLabelEncodingRule] = []
        classes = {"LabelEncodingRule": LabelEncodingRule, "SequenceEncodingRule": SequenceEncodingRule}
        for i in range(meta["n_rules"]):
            rule_cls = classes[(base / f"rule_{i}.type").read_text()]
            rules.append(rule_cls.load(str(base / f"rule_{i}")))
        return cls(rules)
