from replay_tpu.ann.hnsw import HnswIndex
from replay_tpu.ann.mixin import ANNMixin, HnswParam

__all__ = ["ANNMixin", "HnswIndex", "HnswParam"]
