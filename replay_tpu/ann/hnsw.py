"""ctypes wrapper over the native C++ HNSW index.

TPU-native replacement for the reference's hnswlib/nmslib pip dependencies
(reference: replay/models/extensions/ann/ uses hnswlib for dense vectors
and nmslib for sparse, both C++; here the C++ lives in-tree at
replay_tpu/ann/native/hnsw.cpp and is compiled on first use with g++).

Note the TPU framing (SURVEY.md §2.7): exact blocked MIPS top-k on device
(replay_tpu/ops/pallas_topk.py) replaces ANN for most catalog sizes; this
CPU HNSW is the serving-export path for environments without a TPU
attached.
"""

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SPACES = {"l2": 0, "ip": 1, "cosine": 2}
_LIB = None


def _build_library() -> Path:
    src = Path(__file__).parent / "native" / "hnsw.cpp"
    out = Path(__file__).parent / "native" / "libreplay_hnsw.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O3", "-std=c++17", "-fopenmp", "-shared", "-fPIC",
        str(src), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # toolchains without OpenMP: fall back to single-threaded search
        cmd.remove("-fopenmp")
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build_library()))
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_create.argtypes = [ctypes.c_int] * 4
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        lib.hnsw_set_ef.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.hnsw_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_size.restype = ctypes.c_int
        lib.hnsw_add_items.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.hnsw_search.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.hnsw_save.restype = ctypes.c_int
        lib.hnsw_load.argtypes = [ctypes.c_char_p]
        lib.hnsw_load.restype = ctypes.c_void_p
        _LIB = lib
    return _LIB


class HnswIndex:
    """HNSW approximate nearest-neighbour index (native C++)."""

    def __init__(
        self,
        dim: int,
        space: str = "ip",
        m: int = 16,
        ef_construction: int = 200,
        _handle=None,
    ):
        if space not in _SPACES:
            msg = f"space must be one of {sorted(_SPACES)}"
            raise ValueError(msg)
        self.dim = dim
        self.space = space
        self.m = m
        self.ef_construction = ef_construction
        lib = _lib()
        self._h = (
            _handle
            if _handle is not None
            else lib.hnsw_create(dim, _SPACES[space], m, ef_construction)
        )

    def __del__(self):
        if getattr(self, "_h", None):
            _lib().hnsw_free(self._h)
            self._h = None

    def __len__(self) -> int:
        return _lib().hnsw_size(self._h)

    def set_ef(self, ef: int) -> None:
        _lib().hnsw_set_ef(self._h, ef)

    def add_items(self, vectors: np.ndarray, ids: Optional[np.ndarray] = None) -> None:
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        n = len(vectors)
        if vectors.shape[1] != self.dim:
            msg = f"expected dim {self.dim}, got {vectors.shape[1]}"
            raise ValueError(msg)
        if ids is None:
            ids = np.arange(len(self), len(self) + n, dtype=np.int64)
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        _lib().hnsw_add_items(
            self._h,
            vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
        )

    def knn_query(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """:returns: (labels [nq, k] int64, distances [nq, k] float32);
        missing slots are labeled -1.  For ip/cosine the distance is the
        NEGATED similarity (lower = closer), hnswlib convention."""
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        nq = len(queries)
        labels = np.empty((nq, k), dtype=np.int64)
        dists = np.empty((nq, k), dtype=np.float32)
        _lib().hnsw_search(
            self._h,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nq,
            k,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return labels, dists

    def save(self, path: str) -> None:
        rc = _lib().hnsw_save(self._h, str(path).encode())
        if rc != 0:
            msg = f"failed to save index to {path}"
            raise IOError(msg)

    @classmethod
    def load(cls, path: str, space: str = "ip") -> "HnswIndex":
        handle = _lib().hnsw_load(str(path).encode())
        if not handle:
            msg = f"failed to load index from {path}"
            raise IOError(msg)
        # dim etc. are read from the file; mirror minimal fields
        idx = cls.__new__(cls)
        idx._h = handle
        idx.space = space
        idx.dim = None
        return idx
