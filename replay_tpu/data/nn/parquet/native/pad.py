"""ctypes wrapper for the native ragged-row padder (pad.cpp).

Loaded lazily; any build/load failure falls back to the numpy path in
parquet_dataset (the wrapper returns None).  The C call releases the GIL,
so loader worker threads overlap padding with device steps — the round-3
host-data-plane finding (PERF.md).
"""

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB = None
_FAILED = False

_FN_BY_DTYPE = {
    np.dtype(np.int32): ("pad_rows_i32", ctypes.c_int32),
    np.dtype(np.int64): ("pad_rows_i64", ctypes.c_int64),
    np.dtype(np.float32): ("pad_rows_f32", ctypes.c_float),
    np.dtype(np.float64): ("pad_rows_f64", ctypes.c_double),
}


def _build_library() -> Optional[Path]:
    src = Path(__file__).parent / "pad.cpp"
    out = Path(__file__).parent / "libreplay_pad.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(src), "-o", str(out), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        if "-march=native" in cmd:
            cmd.remove("-march=native")
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                return out
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        return None


def _load():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    path = _build_library()
    if path is None:
        _FAILED = True
        return None
    try:
        lib = ctypes.CDLL(str(path))
        for name, ctype in _FN_BY_DTYPE.values():
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctype,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
        _LIB = lib
    except OSError:
        _FAILED = True
    return _LIB


def native_pad_list(flat, lengths, starts, length, padding, dtype,
                    n_threads: int = 0):
    """Left-pad keep-tail via the native library.

    :returns: (arr [B, L] dtype, mask [B, L] int8) or None when the native
        path is unavailable or the dtype is unsupported.
    """
    dtype = np.dtype(dtype)
    if dtype not in _FN_BY_DTYPE:
        return None
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat, dtype=dtype)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    n_rows = len(lengths)
    out = np.empty((n_rows, length), dtype=dtype)
    mask = np.empty((n_rows, length), dtype=np.int8)
    name, ctype = _FN_BY_DTYPE[dtype]
    if n_threads <= 0:
        import os

        n_threads = min(4, os.cpu_count() or 1)
    getattr(lib, name)(
        flat.ctypes.data_as(ctypes.c_void_p),
        starts.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n_rows),
        ctypes.c_int64(length),
        ctype(padding),
        out.ctypes.data_as(ctypes.c_void_p),
        mask.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(n_threads),
    )
    return out, mask
