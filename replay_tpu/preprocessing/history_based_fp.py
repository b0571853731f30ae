"""History-based feature processors.

TPU-native analog of the reference (reference:
replay/preprocessing/history_based_fp.py — LogStatFeaturesProcessor :39,
ConditionalPopularityProcessor :284, HistoryBasedFeaturesProcessor :381).
The Spark aggregation DAGs become pandas groupby pipelines producing the
same feature families: interaction-count statistics, timestamp recency
statistics, rating statistics (incl. the abnormality measure), and
conditional popularity by categorical features.
"""

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

_DAY_SECS = 86400


def _to_seconds(col: pd.Series) -> pd.Series:
    if pd.api.types.is_datetime64_any_dtype(col):
        return col.astype("datetime64[s]").astype("int64")
    if pd.api.types.is_numeric_dtype(col):
        return col.astype("int64")
    return pd.to_datetime(col).astype("datetime64[s]").astype("int64")


class EmptyFeatureProcessor:
    """No-op feature processor: the default slot-filler when a scenario's
    feature-enrichment stage is disabled (reference: history_based_fp.py:22)."""

    def fit(self, log: pd.DataFrame, features: Optional[pd.DataFrame] = None) -> None:
        """Nothing to fit."""

    def transform(self, log: pd.DataFrame) -> pd.DataFrame:
        """Return the log unchanged."""
        return log


class LogStatFeaturesProcessor(EmptyFeatureProcessor):
    """Per-user and per-item log statistics (reference: history_based_fp.py:39)."""

    def __init__(
        self,
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        timestamp_column: str = "timestamp",
    ):
        self.query_column = query_column
        self.item_column = item_column
        self.rating_column = rating_column
        self.timestamp_column = timestamp_column
        self.user_log_features: Optional[pd.DataFrame] = None
        self.item_log_features: Optional[pd.DataFrame] = None

    def _entity_stats(self, log: pd.DataFrame, by: str, prefix: str) -> pd.DataFrame:
        grouped = log.groupby(by)
        out = pd.DataFrame(index=grouped.size().index)
        out[f"{prefix}_log_num_interact"] = np.log(grouped.size())
        if self.timestamp_column in log.columns:
            ts = _to_seconds(log[self.timestamp_column])
            tmp = pd.DataFrame({by: log[by], "_ts": ts})
            g = tmp.groupby(by)["_ts"]
            out[f"{prefix}_min_interact_date"] = g.min()
            out[f"{prefix}_max_interact_date"] = g.max()
            out[f"{prefix}_history_length_days"] = (g.max() - g.min()) / _DAY_SECS
            days = tmp.assign(_d=tmp["_ts"] // _DAY_SECS).groupby(by)["_d"].nunique()
            out[f"{prefix}_log_interact_days_count"] = np.log(days)
            last = ts.max()
            out[f"{prefix}_last_interaction_gap_days"] = (
                last - g.max()
            ) / _DAY_SECS
        if self.rating_column in log.columns:
            g = log.groupby(by)[self.rating_column]
            out[f"{prefix}_mean"] = g.mean()
            out[f"{prefix}_std"] = g.std().fillna(0.0)
            for quant in (0.05, 0.5, 0.95):
                out[f"{prefix}_quantile_{quant}"] = g.quantile(quant)
        return out.reset_index()

    def fit(self, log: pd.DataFrame) -> "LogStatFeaturesProcessor":
        self.user_log_features = self._entity_stats(log, self.query_column, "u")
        self.item_log_features = self._entity_stats(log, self.item_column, "i")
        if self.rating_column in log.columns:
            # abnormality (Lathia et al.): mean |r_ui − mean_i(r)| per user
            item_mean = log.groupby(self.item_column)[self.rating_column].transform("mean")
            ab = (log[self.rating_column] - item_mean).abs()
            abnormality = (
                pd.DataFrame({self.query_column: log[self.query_column], "_ab": ab})
                .groupby(self.query_column)["_ab"]
                .mean()
                .rename("abnormality")
                .reset_index()
            )
            self.user_log_features = self.user_log_features.merge(
                abnormality, on=self.query_column, how="left"
            )
        return self

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        """Join the computed features onto a (query, item) frame; unseen
        entities get zeros with a cold flag."""
        out = df
        if self.user_log_features is not None and self.query_column in df.columns:
            out = out.merge(self.user_log_features, on=self.query_column, how="left")
            out["u_is_cold"] = out["u_log_num_interact"].isna().astype(np.int8)
        if self.item_log_features is not None and self.item_column in df.columns:
            out = out.merge(self.item_log_features, on=self.item_column, how="left")
            out["i_is_cold"] = out["i_log_num_interact"].isna().astype(np.int8)
        return out.fillna(0.0)


class ConditionalPopularityProcessor(EmptyFeatureProcessor):
    """Item popularity conditioned on user categorical features (and vice
    versa) — reference: history_based_fp.py:284."""

    def __init__(
        self,
        cat_features_list: List[str],
        query_column: str = "query_id",
        item_column: str = "item_id",
    ):
        self.cat_features_list = cat_features_list
        self.query_column = query_column
        self.item_column = item_column
        self.conditional_pop_dict: Optional[Dict[str, pd.DataFrame]] = None
        self.entity_name: Optional[str] = None

    def fit(self, log: pd.DataFrame, features: pd.DataFrame) -> "ConditionalPopularityProcessor":
        # user features given → compute per-item conditional popularity
        self.entity_name = (
            self.item_column if self.query_column in features.columns else self.query_column
        )
        join_col = (
            self.query_column if self.entity_name == self.item_column else self.item_column
        )
        joined = log.merge(features, on=join_col, how="inner")
        self.conditional_pop_dict = {}
        for cat in self.cat_features_list:
            counts = (
                joined.groupby([self.entity_name, cat]).size().rename("_n").reset_index()
            )
            totals = counts.groupby(self.entity_name)["_n"].transform("sum")
            counts[f"pop_by_{cat}"] = counts["_n"] / totals
            self.conditional_pop_dict[cat] = counts.drop(columns="_n")
        return self

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df
        for cat, pop in self.conditional_pop_dict.items():
            if cat in out.columns:
                out = out.merge(pop, on=[self.entity_name, cat], how="left")
        return out.fillna(0.0)


class HistoryBasedFeaturesProcessor:
    """Bundle: log stats + conditional popularity (reference:
    history_based_fp.py:381)."""

    def __init__(
        self,
        use_log_features: bool = True,
        use_conditional_popularity: bool = True,
        user_cat_features_list: Optional[List[str]] = None,
        item_cat_features_list: Optional[List[str]] = None,
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        timestamp_column: str = "timestamp",
    ):
        self.use_log_features = use_log_features
        self.use_conditional_popularity = use_conditional_popularity
        self.log_processor = LogStatFeaturesProcessor(
            query_column, item_column, rating_column, timestamp_column
        )
        self.user_cond = (
            ConditionalPopularityProcessor(user_cat_features_list, query_column, item_column)
            if user_cat_features_list
            else None
        )
        self.item_cond = (
            ConditionalPopularityProcessor(item_cat_features_list, query_column, item_column)
            if item_cat_features_list
            else None
        )
        self.fitted = False

    def fit(
        self,
        log: pd.DataFrame,
        user_features: Optional[pd.DataFrame] = None,
        item_features: Optional[pd.DataFrame] = None,
    ) -> "HistoryBasedFeaturesProcessor":
        if self.use_log_features:
            self.log_processor.fit(log)
        if self.use_conditional_popularity:
            if self.user_cond is not None and user_features is not None:
                self.user_cond.fit(log, user_features)
            if self.item_cond is not None and item_features is not None:
                self.item_cond.fit(log, item_features)
        self.fitted = True
        return self

    def transform(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fitted:
            msg = "Processor is not fitted"
            raise RuntimeError(msg)
        out = df
        if self.use_log_features:
            out = self.log_processor.transform(out)
        if self.use_conditional_popularity:
            for cond in (self.user_cond, self.item_cond):
                if cond is not None and cond.conditional_pop_dict is not None:
                    out = cond.transform(out)
        return out
