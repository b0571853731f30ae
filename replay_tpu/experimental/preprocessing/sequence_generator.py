"""SequenceGenerator: next-item training-case builder (reference:
replay/experimental/preprocessing/sequence_generator.py).

For a user's ordered history ``<i1, i2, i3, i4>`` it emits the cases
``(<i1> | i2)``, ``(<i1, i2> | i3)``, ``(<i1, i2, i3> | i4)``: each row
carries the rolling window of up to ``len_window`` PRECEDING values as
``{prefix}{col}{suffix}`` plus the current value as the label column
``{label_prefix}{col}{label_suffix}``; rows whose window would be empty
(each group's first interaction) are dropped.
"""

from typing import List, Optional, Sequence, Union

import pandas as pd


class SequenceGenerator:
    """Creating sequences for sequential models.

    >>> import pandas as pd
    >>> time_interactions = pd.DataFrame({
    ...    "user_id": [1, 1, 1, 2, 2, 2],
    ...    "item_id": [3, 7, 10, 5, 8, 11],
    ... })
    >>> SequenceGenerator(
    ...     groupby_column="user_id", transform_columns=["item_id"]
    ... ).transform(time_interactions)
       user_id item_id_list  label_item_id
    0        1          [3]              7
    1        1       [3, 7]             10
    2        2          [5]              8
    3        2       [5, 8]             11
    """

    def __init__(
        self,
        groupby_column: Union[str, Sequence[str]],
        orderby_column: Union[str, Sequence[str], None] = None,
        transform_columns: Union[str, Sequence[str], None] = None,
        len_window: int = 50,
        sequence_prefix: Optional[str] = None,
        sequence_suffix: Optional[str] = "_list",
        label_prefix: Optional[str] = "label_",
        label_suffix: Optional[str] = None,
        get_list_len: bool = False,
        list_len_column: str = "list_len",
    ):
        self.groupby_column = (
            [groupby_column] if isinstance(groupby_column, str) else list(groupby_column)
        )
        self.orderby_column = (
            None
            if orderby_column is None
            else ([orderby_column] if isinstance(orderby_column, str) else list(orderby_column))
        )
        self.transform_columns = transform_columns
        self.len_window = len_window
        self.sequence_prefix = "" if sequence_prefix is None else sequence_prefix
        self.sequence_suffix = "" if sequence_suffix is None else sequence_suffix
        self.label_prefix = "" if label_prefix is None else label_prefix
        self.label_suffix = "" if label_suffix is None else label_suffix
        self.get_list_len = get_list_len
        self.list_len_column = list_len_column

    def _seq_name(self, col: str) -> str:
        return self.sequence_prefix + col + self.sequence_suffix

    def _label_name(self, col: str) -> str:
        return self.label_prefix + col + self.label_suffix

    def transform(self, interactions: pd.DataFrame) -> pd.DataFrame:
        """Create sequences from given interactions.

        :param interactions: pandas DataFrame
        :returns: one row per non-first interaction in each group, with the
            rolling-window list columns, label columns, and (optionally) the
            window length
        """
        if self.transform_columns is None:
            transform_columns = list(
                set(interactions.columns).difference(self.groupby_column)
            )
        else:
            transform_columns = (
                [self.transform_columns]
                if isinstance(self.transform_columns, str)
                else list(self.transform_columns)
            )

        out = interactions.copy(deep=True)
        sort_by = self.orderby_column if self.orderby_column is not None else self.groupby_column
        out.sort_values(by=sort_by, inplace=True, kind="stable")

        # one pass in sorted-row order with a per-group running history —
        # the Spark-window semantics (partitionBy groupby, orderBy orderby,
        # reference sequence_generator.py:185). The reference's PANDAS
        # backend instead assigns group-major windows positionally onto the
        # orderby-sorted frame, which scrambles rows whenever orderby does
        # not lead with the groupby columns; that quirk is NOT reproduced
        # (regression test: tests/experimental/..::test_cross_group_orderby)
        group_keys = list(
            out[self.groupby_column].itertuples(index=False, name=None)
        )
        for col in transform_columns:
            lists: List[List] = []
            histories: dict = {}
            for key, value in zip(group_keys, out[col]):
                history = histories.setdefault(key, [])
                lists.append(history[-self.len_window :])
                history.append(value)
            out[self._seq_name(col)] = lists
            out[self._label_name(col)] = out[col]

        first = self._seq_name(transform_columns[0])
        out = out[out[first].str.len() > 0]

        select = (
            list(self.groupby_column)
            + [self._seq_name(c) for c in transform_columns]
            + [self._label_name(c) for c in transform_columns]
        )
        if self.get_list_len:
            out = out.copy()
            out[self.list_len_column] = out[first].str.len()
            select.append(self.list_len_column)
        return out[select].reset_index(drop=True)
