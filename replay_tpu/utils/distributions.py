"""Item popularity distribution of recommendations vs the log (reference:
replay/utils/distributions.py:11 item_distribution)."""

import pandas as pd


def item_distribution(
    log: pd.DataFrame,
    recommendations: pd.DataFrame,
    k: int,
    query_column: str = "query_id",
    item_column: str = "item_id",
    rating_column: str = "rating",
) -> pd.DataFrame:
    """Distinct-user counts per item in the log vs. in top-k recommendations."""
    log_counts = (
        log.groupby(item_column)[query_column].nunique().rename("user_count").reset_index()
    )
    top_k = (
        recommendations.sort_values(
            [query_column, rating_column], ascending=[True, False], kind="stable"
        )
        .groupby(query_column, sort=False)
        .head(k)
    )
    rec_counts = (
        top_k.groupby(item_column)[query_column].nunique().rename("rec_count").reset_index()
    )
    res = log_counts.merge(rec_counts, on=item_column, how="outer").fillna(0)
    res["user_count"] = res["user_count"].astype("int64")
    res["rec_count"] = res["rec_count"].astype("int64")
    return res.sort_values(["user_count", item_column]).reset_index(drop=True)
