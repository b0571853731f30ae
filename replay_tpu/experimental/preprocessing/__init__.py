from replay_tpu.experimental.preprocessing.data_preparator import DataPreparator
from replay_tpu.experimental.preprocessing.indexer import Indexer
from replay_tpu.experimental.preprocessing.padder import Padder
from replay_tpu.experimental.preprocessing.sequence_generator import SequenceGenerator

__all__ = ["DataPreparator", "Indexer", "Padder", "SequenceGenerator"]
