"""ctypes bridge to the native setup kernels (native/jchem_native.cpp).

Compiled lazily with g++ on first use; falls back to numpy (meshgrid-based)
implementations when no toolchain is available.  See the .cpp header for the
design rationale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "jchem_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "_native", "libjchem_native.so")


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                os.makedirs(os.path.dirname(so), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError):
            return None
        c_dp = ctypes.POINTER(ctypes.c_double)
        c_ip = ctypes.POINTER(ctypes.c_int64)
        c_bp = ctypes.POINTER(ctypes.c_uint8)
        lib.count_screened_quartets.restype = ctypes.c_int64
        lib.count_screened_quartets.argtypes = [
            c_dp, ctypes.c_int64, c_dp, ctypes.c_int64, ctypes.c_double, ctypes.c_int]
        lib.emit_screened_quartets.restype = ctypes.c_int64
        lib.emit_screened_quartets.argtypes = [
            c_dp, ctypes.c_int64, c_dp, ctypes.c_int64, ctypes.c_double,
            ctypes.c_int, c_ip, c_ip, ctypes.c_int64]
        lib.df_pair_mask.restype = ctypes.c_int64
        lib.df_pair_mask.argtypes = [
            c_dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double, c_bp]
        _lib = lib
        return _lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def screened_quartets(qb: np.ndarray, qk: np.ndarray, cutoff: float,
                      same_block: bool):
    """(rows, cols) of quartets with qb[r] * qk[c] >= cutoff; upper-triangular
    (r <= c) when same_block.  Streams in C++; numpy fallback for tiny inputs
    or missing toolchain."""
    qb = np.ascontiguousarray(qb, dtype=np.float64)
    qk = np.ascontiguousarray(qk, dtype=np.float64)
    lib = _load()
    if lib is None or len(qb) * len(qk) < 1 << 16:
        if same_block:
            r, c = np.triu_indices(len(qb))
        else:
            r, c = np.meshgrid(np.arange(len(qb)), np.arange(len(qk)), indexing="ij")
            r, c = r.ravel(), c.ravel()
        m = qb[r] * qk[c] >= cutoff
        return r[m].astype(np.int64), c[m].astype(np.int64)

    n = lib.count_screened_quartets(_dp(qb), len(qb), _dp(qk), len(qk),
                                    cutoff, int(same_block))
    out_r = np.empty(n, dtype=np.int64)
    out_c = np.empty(n, dtype=np.int64)
    wrote = lib.emit_screened_quartets(
        _dp(qb), len(qb), _dp(qk), len(qk), cutoff, int(same_block),
        out_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
    assert wrote == n
    return out_r, out_c


def df_pair_mask(q: np.ndarray, sigma: float, metric_max: float) -> np.ndarray:
    q = np.ascontiguousarray(q, dtype=np.float64)
    lib = _load()
    if lib is None:
        return (q * q >= sigma**2 / metric_max)
    mask = np.empty(len(q), dtype=np.uint8)
    lib.df_pair_mask(_dp(q), len(q), sigma, metric_max,
                     mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mask.astype(bool)
