"""Native (C++) runtime components, loaded via ctypes.

The hot host-side paths that must not run interpreted (SURVEY.md §2.14):
edge-list parsing, CSR build+squish, and the sequential degeneracy peel.
The library auto-builds with `make` on first import (g++ is part of the
toolchain); every entry point has a NumPy fallback in its caller, so a
missing compiler only costs speed, never correctness.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgms_native.so")


def _load():
    src = os.path.join(_DIR, "src", "gms_native.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.el_count_tokens.restype = ctypes.c_int64
    lib.el_count_tokens.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.el_parse_pairs.restype = ctypes.c_int64
    lib.el_parse_pairs.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"), ctypes.c_int64]
    lib.csr_build_squish.restype = ctypes.c_int64
    lib.csr_build_squish.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int]
    lib.degeneracy_peel.restype = ctypes.c_int32
    lib.degeneracy_peel.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    return lib


_lib = _load()


def available() -> bool:
    return _lib is not None


def parse_edge_list(path: str) -> np.ndarray | None:
    """Fast .el/.wel parser -> int64[M, 2], or None to signal fallback."""
    if _lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    # upper bound on pairs = number of newlines + 1
    max_pairs = buf.count(b"\n") + 1
    out = np.empty((max_pairs, 2), dtype=np.int64)
    n = _lib.el_parse_pairs(buf, len(buf), out.reshape(-1), max_pairs)
    if n < 0:
        return None  # malformed for the fast path; caller falls back
    return out[:n]


def csr_build_squish(edges: np.ndarray, num_nodes: int,
                     drop_self_loops: bool = True):
    """(indptr int64[n+1], indices int32[m']) from int64[M, 2] edges,
    rows sorted + deduplicated; or None to signal fallback."""
    if _lib is None:
        return None
    edges = np.ascontiguousarray(edges, dtype=np.int64)
    m = len(edges)
    indptr = np.empty(num_nodes + 1, dtype=np.int64)
    indices = np.empty(max(m, 1), dtype=np.int32)
    w = _lib.csr_build_squish(edges.reshape(-1), m, num_nodes, indptr,
                              indices, int(drop_self_loops))
    return indptr, indices[:w].copy()


def degeneracy_peel(indptr: np.ndarray, indices: np.ndarray):
    """(rank int32[n], core int32[n], degeneracy int) or None (fallback)."""
    if _lib is None:
        return None
    n = len(indptr) - 1
    rank = np.empty(n, dtype=np.int32)
    core = np.empty(n, dtype=np.int32)
    k = _lib.degeneracy_peel(
        n, np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32), rank, core)
    return rank, core, int(k)
