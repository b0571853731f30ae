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


def _build_dirs() -> list:
    """Candidate output dirs: package dir, then a per-user cache dir (the
    package dir may be read-only in installed environments)."""
    dirs = [Path(__file__).parent]
    try:
        import os
        cache = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")) / "replay_tpu"
        dirs.append(cache)
    except Exception:  # pragma: no cover - $HOME unset edge case
        pass
    return dirs


def _compile(src: Path, out: Path) -> bool:
    """Compile to a unique temp file, then atomically rename into place so a
    concurrent builder (multi-process training, parallel test workers) can
    never CDLL a partially written .so."""
    import os
    tmp = out.with_suffix(f".tmp{os.getpid()}.so")
    for flags in (["-march=native"], []):
        cmd = ["g++", "-O3", *flags, "-std=c++17", "-shared", "-fPIC",
               str(src), "-o", str(tmp), "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, out)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            tmp.unlink(missing_ok=True)
    return False


def _build_library() -> Optional[Path]:
    src = Path(__file__).parent / "pad.cpp"
    for out_dir in _build_dirs():
        out = out_dir / "libreplay_pad.so"
        try:
            if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
                return out
            out_dir.mkdir(parents=True, exist_ok=True)
        except OSError:
            continue
        if _compile(src, out):
            return out
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
