"""ctypes bindings for the native npz episode reader (native/npz_reader.cpp).

Replaces per-frame Python np.load in the CALVIN window assembly
(data.py:660-685) with threaded C++ pread into a preallocated batch buffer.
Compiles lazily with g++ on first use (cached .so); any failure — missing
toolchain, parse errors — falls back to numpy silently, so the framework
never depends on the native path for correctness.  Both STORED and DEFLATE
(savez_compressed) members are handled natively (zlib).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "npz_reader.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libnpz_reader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False

_DTYPES = {
    "<f4": np.float32, "<f8": np.float64, "<i4": np.int32, "<i8": np.int64,
    "|u1": np.uint8, "<u1": np.uint8, "|i1": np.int8, "<f2": np.float16,
    "<u2": np.uint16, "<i2": np.int16, "|b1": np.bool_,
}


def _build() -> Optional[ctypes.CDLL]:
    global _failed
    try:
        os.makedirs(_LIB_DIR, exist_ok=True)
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 _SRC, "-o", _LIB, "-lz"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.npz_probe.restype = ctypes.c_int
        lib.npz_read.restype = ctypes.c_int
        lib.npz_read_many.restype = ctypes.c_int
        return lib
    except Exception:
        _failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _failed:
        with _lock:
            if _lib is None and not _failed:
                _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def probe(path: str, key: str):
    """(shape, dtype, nbytes) or None if the native path can't serve it."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_long * 8)()
    ndim = ctypes.c_int()
    dtype = ctypes.create_string_buffer(8)
    nbytes = ctypes.c_long()
    rc = lib.npz_probe(path.encode(), key.encode(), shape,
                       ctypes.byref(ndim), dtype, ctypes.byref(nbytes))
    if rc != 0:
        return None
    dt = _DTYPES.get(dtype.value.decode())
    if dt is None:
        return None
    return tuple(shape[:ndim.value]), np.dtype(dt), int(nbytes.value)


def read_key(path: str, key: str) -> Optional[np.ndarray]:
    info = probe(path, key)
    if info is None:
        return None
    shape, dt, nbytes = info
    out = np.empty(nbytes, np.uint8)
    lib = get_lib()
    rc = lib.npz_read(path.encode(), key.encode(),
                      out.ctypes.data_as(ctypes.c_void_p), nbytes)
    if rc != 0:
        return None
    return out.view(dt).reshape(shape)


def read_window(paths: Sequence[str], key: str,
                n_threads: int = 8) -> Optional[np.ndarray]:
    """Stack one key across a window of frame files: (len(paths), *shape).
    Returns None -> caller falls back to numpy."""
    if not paths:
        return None
    info = probe(paths[0], key)
    if info is None:
        return None
    shape, dt, nbytes = info
    n = len(paths)
    out = np.empty((n, nbytes), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib = get_lib()
    rc = lib.npz_read_many(arr, n, key.encode(),
                           out.ctypes.data_as(ctypes.c_void_p),
                           nbytes, n_threads)
    if rc != 0:
        return None
    return out.view(dt).reshape((n,) + shape)
