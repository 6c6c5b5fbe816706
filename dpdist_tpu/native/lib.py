"""ctypes bindings + on-demand build of the native host runtime.

Builds src/pointcloud_native.cpp with g++ into native/_build/ on first
use (no pybind11 in this environment; plain C ABI + ctypes). Every entry
point degrades gracefully to numpy when the toolchain is unavailable, so
the framework never hard-depends on the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "pointcloud_native.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD_DIR, "pointcloud_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # NOTE: no -ffast-math — linking crtfastmath.o from a shared library
    # sets the process-wide FTZ/DAZ bits and silently changes numpy's
    # subnormal behavior for the whole host process.
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", "-pthread", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.pn_parse_csv_floats.restype = ctypes.c_long
        lib.pn_parse_csv_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.pn_min_distances.restype = None
        lib.pn_min_distances.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.pn_nn_distance.restype = None
        lib.pn_nn_distance.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def fast_loadtxt(path: str, cols: int) -> np.ndarray:
    """Parse a delimited float text file into (rows, cols) float32.

    ~20x faster than np.loadtxt for the GT-distance files. Falls back to
    numpy if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return np.loadtxt(path, delimiter=",").astype(np.float32).reshape(-1, cols)
    size = os.path.getsize(path)
    # floats are >= 2 bytes of text each; generous bound
    max_vals = size // 2 + 16
    buf = np.empty(max_vals, np.float32)
    n = lib.pn_parse_csv_floats(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_vals,
    )
    if n < 0:
        raise FileNotFoundError(path)
    if n % cols:
        raise ValueError(f"{path}: parsed {n} floats, not divisible by {cols}")
    return buf[:n].reshape(-1, cols).copy()


def min_distances_native(query: np.ndarray, dense: np.ndarray,
                         n_threads: int = 0) -> np.ndarray | None:
    """Threaded brute-force min distances; None if native lib missing."""
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(query, np.float32)
    d = np.ascontiguousarray(dense, np.float32)
    out = np.empty(len(q), np.float32)
    lib.pn_min_distances(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(q),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(d),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    return out


def nn_distance_native(a: np.ndarray, b: np.ndarray,
                       n_threads: int = 0):
    """(squared dists, indices) of nearest b-point per a-point, or None."""
    lib = _load()
    if lib is None:
        return None
    aa = np.ascontiguousarray(a, np.float32)
    bb = np.ascontiguousarray(b, np.float32)
    dist = np.empty(len(aa), np.float32)
    idx = np.empty(len(aa), np.int32)
    lib.pn_nn_distance(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(bb),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads,
    )
    return dist, idx
