"""Train/test splitters (reference: replay/splitters/)."""

from replay_tpu.splitters.base_splitter import Splitter, SplitterReturnType
from replay_tpu.splitters.cold_user_random_splitter import ColdUserRandomSplitter
from replay_tpu.splitters.k_folds import KFolds
from replay_tpu.splitters.last_n_splitter import LastNSplitter
from replay_tpu.splitters.new_users_splitter import NewUsersSplitter
from replay_tpu.splitters.random_next_n_splitter import RandomNextNSplitter
from replay_tpu.splitters.random_splitter import RandomSplitter
from replay_tpu.splitters.ratio_splitter import RatioSplitter
from replay_tpu.splitters.time_splitter import TimeSplitter
from replay_tpu.splitters.two_stage_splitter import TwoStageSplitter

__all__ = [
    "ColdUserRandomSplitter",
    "KFolds",
    "LastNSplitter",
    "NewUsersSplitter",
    "RandomNextNSplitter",
    "RandomSplitter",
    "RatioSplitter",
    "Splitter",
    "SplitterReturnType",
    "TimeSplitter",
    "TwoStageSplitter",
]
