"""Numeric-column discretization (bucketing).

TPU-native analog of the reference (reference:
replay/preprocessing/discretizer.py — GreedyDiscretizingRule :63,
QuantileDiscretizingRule :376, Discretizer :603).  The greedy strategy is
the LightGBM bin-finding algorithm; the quantile strategy uses empirical
quantile edges.  Single pandas backend (the framework's CPU data plane);
``handle_invalid`` ∈ {error, skip, keep} where *keep* routes NaNs to the
extra bucket ``n_bins``.
"""

import abc
import json
import warnings
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

_HANDLE_INVALID_STRATEGIES = ("error", "skip", "keep")

try:  # public strategy type (reference: replay/preprocessing/discretizer.py:25)
    from typing import Literal

    HandleInvalidStrategies = Literal["error", "skip", "keep"]
except ImportError:  # pragma: no cover
    HandleInvalidStrategies = str


class BaseDiscretizingRule(abc.ABC):
    """One-column discretization rule."""

    _col: str
    _n_bins: int
    _bins: Optional[List[float]]
    _handle_invalid: str

    @property
    def column(self) -> str:
        return self._col

    @property
    def n_bins(self) -> int:
        return self._n_bins

    @property
    def bins(self) -> Optional[List[float]]:
        return self._bins

    def set_handle_invalid(self, handle_invalid: str) -> None:
        """Switch the invalid-value strategy (reference:
        replay/preprocessing/discretizer.py set_handle_invalid on rules)."""
        if handle_invalid not in _HANDLE_INVALID_STRATEGIES:
            msg = f"handle_invalid must be one of {_HANDLE_INVALID_STRATEGIES}"
            raise ValueError(msg)
        self._handle_invalid = handle_invalid

    @abc.abstractmethod
    def fit(self, df: pd.DataFrame) -> "BaseDiscretizingRule": ...

    def partial_fit(self, df: pd.DataFrame) -> "BaseDiscretizingRule":
        if self._bins is None:
            return self.fit(df)
        return self

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        if self._bins is None:
            msg = "Rule is not fitted"
            raise RuntimeError(msg)
        out = df.copy()
        values = out[self._col]
        invalid = values.isna()
        if invalid.any():
            if self._handle_invalid == "error":
                msg = f"Column {self._col} contains NaN values"
                raise ValueError(msg)
            if self._handle_invalid == "skip":
                out = out[~invalid]
                values = out[self._col]
                invalid = values.isna()
        # values equal to an inner edge fall in the RIGHT bin (sklearn
        # KBinsDiscretizer.transform searchsorted side="right" semantics)
        binned = (
            np.searchsorted(np.asarray(self._bins[1:-1]), values.to_numpy(), side="right")
            .astype(np.int64)
        )
        binned = np.where(invalid.to_numpy(), self._n_bins, binned)
        out[self._col] = binned
        return out

    def fit_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        return self.fit(df).transform(df)

    # -------------------------------------------------------------- save/load
    def _state(self) -> dict:
        return {
            "class": type(self).__name__,
            "column": self._col,
            "n_bins": self._n_bins,
            "handle_invalid": self._handle_invalid,
            "bins": [float(b) for b in (self._bins or [])] or None,
        }

    def save(self, path: str) -> None:
        target = Path(path)
        target.mkdir(parents=True, exist_ok=True)
        (target / f"{type(self).__name__}.json").write_text(json.dumps(self._state()))

    @classmethod
    def load(cls, path: str) -> "BaseDiscretizingRule":
        state = json.loads((Path(path) / f"{cls.__name__}.json").read_text())
        rule = cls(column=state["column"], n_bins=state["n_bins"], handle_invalid=state["handle_invalid"])
        if state["bins"] is not None:
            bins = state["bins"]
            bins[0] = -np.inf
            bins[-1] = np.inf
            rule._bins = bins
        return rule


class GreedyDiscretizingRule(BaseDiscretizingRule):
    """LightGBM-style greedy binning (reference: discretizer.py:63, algorithm
    from LightGBM src/io/bin.cpp GreedyFindBin)."""

    def __init__(
        self,
        column: str,
        n_bins: int,
        min_data_in_bin: int = 1,
        handle_invalid: str = "keep",
    ) -> None:
        if handle_invalid not in _HANDLE_INVALID_STRATEGIES:
            msg = f"handle_invalid should be one of {_HANDLE_INVALID_STRATEGIES}, got {handle_invalid}."
            raise ValueError(msg)
        self._col = column
        self._n_bins = n_bins
        self._min_data_in_bin = min_data_in_bin
        self._handle_invalid = handle_invalid
        self._bins: Optional[List[float]] = None

    def _greedy_bin_find(self, distinct_values, counts, max_bin, total_cnt, min_data_in_bin):
        n_distinct = len(distinct_values)
        bin_upper_bound: List[float] = []
        if total_cnt < max_bin * min_data_in_bin:
            warnings.warn(
                f"Expected at least {max_bin * min_data_in_bin} samples "
                f"(n_bins*min_data_in_bin). Got {total_cnt}. "
                "The number of bins will be less in the result"
            )
        if n_distinct <= max_bin:
            cur = 0
            for i in range(n_distinct - 1):
                cur += counts[i]
                if cur >= min_data_in_bin:
                    bin_upper_bound.append((distinct_values[i] + distinct_values[i + 1]) / 2.0)
                    cur = 0
            bin_upper_bound.append(float("inf"))
            return bin_upper_bound

        if min_data_in_bin > 0:
            max_bin = max(min(max_bin, total_cnt // min_data_in_bin), 1)
        mean_bin_size = total_cnt / max_bin
        rest_bin_cnt = max_bin
        rest_sample_cnt = total_cnt
        is_big = counts >= mean_bin_size
        rest_bin_cnt -= int(np.sum(is_big))
        rest_sample_cnt -= int(np.sum(counts[is_big]))
        mean_bin_size = rest_sample_cnt / max(rest_bin_cnt, 1)

        upper = [float("inf")] * max_bin
        lower = [float("inf")] * max_bin
        bin_cnt = 0
        lower[0] = distinct_values[0]
        cur = 0
        for i in range(n_distinct - 1):
            if not is_big[i]:
                rest_sample_cnt -= counts[i]
            cur += counts[i]
            if (
                is_big[i]
                or cur >= mean_bin_size
                or (is_big[i + 1] and cur >= max(1.0, mean_bin_size * 0.5))
            ):
                upper[bin_cnt] = distinct_values[i]
                bin_cnt += 1
                lower[bin_cnt] = distinct_values[i + 1]
                if bin_cnt >= max_bin - 1:
                    break
                cur = 0
                if not is_big[i]:
                    rest_bin_cnt -= 1
                    mean_bin_size = rest_sample_cnt / max(rest_bin_cnt, 1)
        bin_upper_bound = [(upper[i] + lower[i + 1]) / 2.0 for i in range(bin_cnt - 1)]
        bin_upper_bound.append(float("inf"))
        return bin_upper_bound

    def fit(self, df: pd.DataFrame) -> "GreedyDiscretizingRule":
        if self._bins is not None:
            # repeated fit is a no-op (reference contract, discretizer.py:450:
            # `if self._is_fitted: return self`); use partial_fit to extend
            return self
        values = df[self._col]
        if values.isna().any() and self._handle_invalid == "error":
            msg = f"Column {self._col} contains NaN values"
            raise ValueError(msg)
        vc = values.dropna().value_counts().sort_index()
        if vc.empty:
            msg = f"Cannot fit discretizer: column {self._col} has no valid values"
            raise ValueError(msg)
        bins = self._greedy_bin_find(
            vc.index.to_numpy(dtype=float),
            vc.to_numpy(),
            self._n_bins + 1,
            int(vc.sum()),
            self._min_data_in_bin,
        )
        self._bins = [-np.inf, *bins]
        return self


class QuantileDiscretizingRule(BaseDiscretizingRule):
    """Equal-frequency (quantile) binning (reference: discretizer.py:376)."""

    def __init__(self, column: str, n_bins: int, handle_invalid: str = "keep") -> None:
        if handle_invalid not in _HANDLE_INVALID_STRATEGIES:
            msg = f"handle_invalid should be one of {_HANDLE_INVALID_STRATEGIES}, got {handle_invalid}."
            raise ValueError(msg)
        self._col = column
        self._n_bins = n_bins
        self._handle_invalid = handle_invalid
        self._bins: Optional[List[float]] = None

    def fit(self, df: pd.DataFrame) -> "QuantileDiscretizingRule":
        if self._bins is not None:
            # repeated fit is a no-op (reference contract, discretizer.py:450)
            return self
        values = df[self._col]
        if values.isna().any() and self._handle_invalid == "error":
            msg = f"Column {self._col} contains NaN values"
            raise ValueError(msg)
        clean = values.dropna().to_numpy(dtype=float)
        if clean.size == 0:
            msg = f"Cannot fit discretizer: column {self._col} has no valid values"
            raise ValueError(msg)
        # the reference's rule wraps sklearn KBinsDiscretizer
        # (discretizer.py:429), whose quantile strategy is
        # np.percentile(col, linspace(0, 100, n+1), method="averaged_inverted_cdf")
        # for sklearn >= 1.9 — percentile levels (not 0..1 fractions) matter:
        # averaged_inverted_cdf is a step function of q, so q=100/7 vs 1/7
        # land in different steps
        levels = np.linspace(0, 100, self._n_bins + 1)
        edges = np.unique(
            np.percentile(clean, levels, method="averaged_inverted_cdf")
        )
        bins = edges.tolist()
        bins[0] = -np.inf
        bins[-1] = np.inf
        self._bins = bins
        return self


class Discretizer:
    """Applies a set of per-column rules (reference: discretizer.py:603)."""

    def __init__(self, rules: Sequence[BaseDiscretizingRule]):
        columns = [r.column for r in rules]
        if len(set(columns)) != len(columns):
            msg = "Rule columns must be unique"
            raise ValueError(msg)
        self.rules = list(rules)

    def fit(self, df: pd.DataFrame) -> "Discretizer":
        for rule in self.rules:
            rule.fit(df)
        return self

    def set_handle_invalid(self, handle_invalid: str) -> None:
        """Switch the invalid-value strategy on every rule (reference:
        replay/preprocessing/discretizer.py:56 set_handle_invalid)."""
        if handle_invalid not in _HANDLE_INVALID_STRATEGIES:
            msg = f"handle_invalid must be one of {_HANDLE_INVALID_STRATEGIES}"
            raise ValueError(msg)
        for rule in self.rules:
            rule.set_handle_invalid(handle_invalid)

    def partial_fit(self, df: pd.DataFrame) -> "Discretizer":
        for rule in self.rules:
            rule.partial_fit(df)
        return self

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        for rule in self.rules:
            df = rule.transform(df)
        return df

    def fit_transform(self, df: pd.DataFrame) -> pd.DataFrame:
        return self.fit(df).transform(df)

    def save(self, path: str) -> None:
        target = Path(path)
        target.mkdir(parents=True, exist_ok=True)
        states = [r._state() for r in self.rules]
        (target / "discretizer.json").write_text(json.dumps(states))

    @classmethod
    def load(cls, path: str) -> "Discretizer":
        states = json.loads((Path(path) / "discretizer.json").read_text())
        classes = {
            "GreedyDiscretizingRule": GreedyDiscretizingRule,
            "QuantileDiscretizingRule": QuantileDiscretizingRule,
        }
        rules = []
        for state in states:
            rule_cls = classes[state["class"]]
            rule = rule_cls(
                column=state["column"],
                n_bins=state["n_bins"],
                handle_invalid=state["handle_invalid"],
            )
            if state["bins"] is not None:
                bins = state["bins"]
                bins[0] = -np.inf
                bins[-1] = np.inf
                rule._bins = bins
            rules.append(rule)
        return cls(rules)
