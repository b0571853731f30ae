"""Index stores: where a serialized ANN index lives.

TPU-native analog of the reference's index-store family (reference:
replay/models/extensions/ann/index_stores/{shared_disk,spark_files,hdfs}_index_store.py):
the store abstracts the binary index artifact's location so builders dump
once and inferers load anywhere.  Here the variants are:

- :class:`DiskIndexStore` — a directory on shared disk (the reference's
  SharedDiskIndexStore);
- :class:`BytesIndexStore` — the index as an in-memory bytes blob, the
  unit of distribution for shipping an index between hosts (the analog of
  SparkFiles/HDFS distribution: serialize once, broadcast the bytes, load
  on every host).

Both round-trip any index class exposing ``save(path)`` + ``load(path)``
(HnswIndex, SparseSimilarityIndex).
"""

import tempfile
from abc import ABC, abstractmethod
from pathlib import Path


class IndexStore(ABC):
    """Dump/load a binary index artifact."""

    @abstractmethod
    def dump(self, index) -> None:
        """Persist ``index`` into the store."""

    @abstractmethod
    def load(self, index_cls, **load_kwargs):
        """Reconstruct an index of ``index_cls`` from the store."""

    @abstractmethod
    def exists(self) -> bool:
        """Whether the store currently holds an artifact."""


class DiskIndexStore(IndexStore):
    """Index file under a shared-disk directory (reference
    shared_disk_index_store.py)."""

    def __init__(self, directory: str, filename: str = "index.bin"):
        self.directory = Path(directory)
        self.filename = filename

    @property
    def path(self) -> Path:
        return self.directory / self.filename

    def dump(self, index) -> None:
        self.directory.mkdir(parents=True, exist_ok=True)
        index.save(str(self.path))

    def load(self, index_cls, **load_kwargs):
        if not self.exists():
            msg = f"no index artifact at {self.path}"
            raise FileNotFoundError(msg)
        return index_cls.load(str(self.path), **load_kwargs)

    def exists(self) -> bool:
        return self.path.exists()


class BytesIndexStore(IndexStore):
    """Index held as a bytes blob (ship-it-anywhere distribution unit)."""

    def __init__(self, blob: bytes = None):
        self.blob = blob

    def dump(self, index) -> None:
        with tempfile.NamedTemporaryFile(suffix=".bin") as tmp:
            index.save(tmp.name)
            self.blob = Path(tmp.name).read_bytes()

    def load(self, index_cls, **load_kwargs):
        if not self.exists():
            msg = "BytesIndexStore holds no artifact"
            raise FileNotFoundError(msg)
        with tempfile.NamedTemporaryFile(suffix=".bin") as tmp:
            Path(tmp.name).write_bytes(self.blob)
            return index_cls.load(tmp.name, **load_kwargs)

    def exists(self) -> bool:
        return self.blob is not None
