"""Differential parity: Padder / SequenceGenerator vs the reference's own
pandas implementations (reference:
replay/experimental/preprocessing/{padder,sequence_generator}.py).
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.parity

REFERENCE = Path("/root/reference")

if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout absent", allow_module_level=True)

from tests.parity.conftest import _install_polars_stub  # noqa: E402

_install_polars_stub()
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))


def _random_list_frame(seed: int, n: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, n),
            "seq": [list(rng.integers(0, 100, rng.integers(0, 9))) for _ in range(n)],
            "ts_list": [list(rng.integers(0, 50, rng.integers(0, 9))) for _ in range(n)],
        }
    )


@pytest.mark.parametrize("padding_side", ["left", "right"])
@pytest.mark.parametrize("cut_side", ["left", "right"])
# the reference ctor rejects -1 (its transform's pad-to-longest branch is
# unreachable upstream); replay_tpu keeps -1 as a documented extension,
# covered by test_padder_minus_one_extension below
@pytest.mark.parametrize("array_size", [4, 8])
@pytest.mark.parametrize("cut_array", [True, False])
def test_padder_matches_reference(padding_side, cut_side, array_size, cut_array):
    from replay.experimental.preprocessing.padder import Padder as RefPadder

    from replay_tpu.experimental.preprocessing import Padder

    df = _random_list_frame(seed=abs(array_size) + 7 * cut_array)
    # equal-length list rows so ragged arrays compare cell-by-cell
    kwargs = dict(
        pad_columns=["seq", "ts_list"],
        padding_side=padding_side,
        padding_value=[0, -1],
        array_size=array_size,
        cut_array=cut_array,
        cut_side=cut_side,
    )
    ours = Padder(**kwargs).transform(df)
    theirs = RefPadder(**kwargs).transform(df)
    for col in ("seq", "ts_list"):
        assert ours[col].tolist() == theirs[col].tolist(), col


def test_padder_minus_one_extension():
    from replay_tpu.experimental.preprocessing import Padder

    df = pd.DataFrame({"seq": [[1], [1, 2, 3], [4, 5]]})
    out = Padder("seq", padding_value=0, array_size=-1).transform(df)
    assert out["seq"].tolist() == [[1, 0, 0], [1, 2, 3], [4, 5, 0]]


def test_sequence_generator_matches_reference():
    from replay.experimental.preprocessing.sequence_generator import (
        SequenceGenerator as RefGen,
    )

    from replay_tpu.experimental.preprocessing import SequenceGenerator

    rng = np.random.default_rng(3)
    n = 60
    df = pd.DataFrame(
        {
            "user_id": np.sort(rng.integers(0, 6, n)),
            "item_id": rng.integers(0, 40, n),
            "timestamp": np.arange(n),
        }
    )
    kwargs = dict(
        groupby_column="user_id",
        orderby_column=["user_id", "timestamp"],
        transform_columns=["item_id", "timestamp"],
        len_window=5,
        get_list_len=True,
    )
    ours = SequenceGenerator(**kwargs).transform(df)
    theirs = RefGen(**kwargs).transform(df)
    theirs = theirs[ours.columns].reset_index(drop=True)
    assert ours["item_id_list"].tolist() == theirs["item_id_list"].tolist()
    assert ours["timestamp_list"].tolist() == theirs["timestamp_list"].tolist()
    assert ours["label_item_id"].tolist() == theirs["label_item_id"].tolist()
    assert ours["list_len"].tolist() == theirs["list_len"].tolist()
    assert ours["user_id"].tolist() == theirs["user_id"].tolist()


def test_sequence_generator_doctest_shape():
    from replay_tpu.experimental.preprocessing import SequenceGenerator

    df = pd.DataFrame(
        {"user_id": [1, 1, 1, 2, 2, 2], "item_id": [3, 7, 10, 5, 8, 11]}
    )
    out = SequenceGenerator(groupby_column="user_id", transform_columns=["item_id"]).transform(df)
    assert out["item_id_list"].tolist() == [[3], [3, 7], [5], [5, 8]]
    assert out["label_item_id"].tolist() == [7, 10, 8, 11]
