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
        "g++", "-O3", "-march=native", "-funroll-loops", "-std=c++17",
        "-fopenmp", "-shared", "-fPIC", str(src), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # older toolchains: drop -march=native first, then OpenMP
        for flag in ("-march=native", "-fopenmp"):
            if flag in cmd:
                cmd.remove(flag)
                try:
                    subprocess.run(cmd, check=True, capture_output=True)
                    return out
                except subprocess.CalledProcessError:
                    continue
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
        lib.hnsw_search_filtered.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ssim_create.restype = ctypes.c_void_p
        lib.ssim_create.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.ssim_free.argtypes = [ctypes.c_void_p]
        lib.ssim_size.argtypes = [ctypes.c_void_p]
        lib.ssim_size.restype = ctypes.c_int
        lib.ssim_search.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ssim_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.ssim_save.restype = ctypes.c_int
        lib.ssim_load.argtypes = [ctypes.c_char_p]
        lib.ssim_load.restype = ctypes.c_void_p
        _LIB = lib
    return _LIB


def _i64_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


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

    def knn_query_filtered(
        self, queries: np.ndarray, k: int, exclude_lists
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Like :meth:`knn_query` but per-query exclusion label lists are
        honored INSIDE the native search (filter-seen without the Python
        over-fetch loop; reference filter-seen inferers,
        index_inferers/*filter*_inferer.py)."""
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        nq = len(queries)
        lens = np.fromiter((len(e) for e in exclude_lists), dtype=np.int64, count=nq)
        indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        flat = (
            np.concatenate([np.sort(np.asarray(e, dtype=np.int64)) for e in exclude_lists])
            if indptr[-1]
            else np.zeros(1, dtype=np.int64)
        )
        flat = np.ascontiguousarray(flat, dtype=np.int64)
        labels = np.empty((nq, k), dtype=np.int64)
        dists = np.empty((nq, k), dtype=np.float32)
        _lib().hnsw_search_filtered(
            self._h, _f32_ptr(queries), nq, k,
            _i64_ptr(indptr), _i64_ptr(flat), _i64_ptr(labels), _f32_ptr(dists),
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


class SparseSimilarityIndex:
    """Sparse item-item similarity index for NeighbourRec serving.

    Native analog of the reference's nmslib sparse index
    (reference: replay/models/extensions/ann/index_builders/*nmslib*.py,
    index_inferers/nmslib_filter_index_inferer.py): the index holds the CSR
    similarity matrix; a query is a sparse user profile and the result is
    top-k of profile · similarity with seen items excluded inside the native
    kernel.  Unlike nmslib's HNSW it is EXACT — recsys similarity rows are
    sparse enough that exact accumulation beats approximate graph search.
    """

    def __init__(self, sim_csr=None, _handle=None):
        if _handle is not None:
            self._h = _handle
            return
        from scipy.sparse import csr_matrix

        sim = csr_matrix(sim_csr).astype(np.float32)
        sim.sort_indices()
        indptr = np.ascontiguousarray(sim.indptr, dtype=np.int64)
        indices = np.ascontiguousarray(sim.indices, dtype=np.int32)
        values = np.ascontiguousarray(sim.data, dtype=np.float32)
        self._h = _lib().ssim_create(
            sim.shape[0], _i64_ptr(indptr), _i32_ptr(indices), _f32_ptr(values),
            np.int64(len(values)),
        )

    def __del__(self):
        if getattr(self, "_h", None):
            _lib().ssim_free(self._h)
            self._h = None

    def __len__(self) -> int:
        return _lib().ssim_size(self._h)

    def search(self, profiles, k: int, exclude_lists=None):
        """:param profiles: scipy CSR [nq, n_items] user profiles.
        :param exclude_lists: optional per-query seen item-position lists.
        :returns: (labels [nq, k] int64 item positions, -1 padded;
                   scores [nq, k] float32)."""
        from scipy.sparse import csr_matrix

        profiles = csr_matrix(profiles).astype(np.float32)
        nq = profiles.shape[0]
        q_indptr = np.ascontiguousarray(profiles.indptr, dtype=np.int64)
        q_indices = np.ascontiguousarray(profiles.indices, dtype=np.int32)
        q_values = np.ascontiguousarray(profiles.data, dtype=np.float32)
        if exclude_lists is not None:
            lens = np.fromiter((len(e) for e in exclude_lists), dtype=np.int64, count=nq)
            e_indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            e_flat = (
                np.concatenate([np.asarray(e, dtype=np.int32) for e in exclude_lists])
                if e_indptr[-1]
                else np.zeros(1, dtype=np.int32)
            )
            e_indptr = np.ascontiguousarray(e_indptr)
            e_flat = np.ascontiguousarray(e_flat, dtype=np.int32)
            ep, ef = _i64_ptr(e_indptr), _i32_ptr(e_flat)
        else:
            ep, ef = None, None
        labels = np.empty((nq, k), dtype=np.int64)
        scores = np.empty((nq, k), dtype=np.float32)
        _lib().ssim_search(
            self._h, _i64_ptr(q_indptr), _i32_ptr(q_indices), _f32_ptr(q_values),
            nq, k, ep, ef, _i64_ptr(labels), _f32_ptr(scores),
        )
        return labels, scores

    def save(self, path: str) -> None:
        rc = _lib().ssim_save(self._h, str(path).encode())
        if rc != 0:
            msg = f"failed to save index to {path}"
            raise IOError(msg)

    @classmethod
    def load(cls, path: str) -> "SparseSimilarityIndex":
        handle = _lib().ssim_load(str(path).encode())
        if not handle:
            msg = f"failed to load index from {path}"
            raise IOError(msg)
        return cls(_handle=handle)
