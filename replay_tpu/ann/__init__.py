from replay_tpu.ann.hnsw import HnswIndex, SparseSimilarityIndex
from replay_tpu.ann.mixin import ANNMixin, HnswParam, SparseSimParam
from replay_tpu.ann.stores import BytesIndexStore, DiskIndexStore, IndexStore

__all__ = [
    "ANNMixin",
    "BytesIndexStore",
    "DiskIndexStore",
    "HnswIndex",
    "HnswParam",
    "IndexStore",
    "SparseSimParam",
    "SparseSimilarityIndex",
]
