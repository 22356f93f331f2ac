"""Native host-ops loader with numpy fallback.

Builds/loads the C++ ``hostops`` shared library (hash join, row dedup) used
by the host-side mesh/DOF pipeline.  If the compiled library is unavailable
and cannot be built, vectorized numpy implementations are used instead --
same results, slower on very large meshes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

__all__ = [
    "available", "hash_join_rows", "unique_rows", "match_rows",
    "ilu0_factor_csr", "tri_levels",
]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "hostops.cpp")
_LIB_PATH = os.path.join(_HERE, "_hostops.so")
_lib = None


def _try_build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    try:
        subprocess.run(
            [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _try_build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hash_join_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.unique_rows.restype = ctypes.c_int64
        lib.unique_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        if hasattr(lib, "ilu0_factor_csr"):
            lib.ilu0_factor_csr.restype = ctypes.c_int64
            lib.ilu0_factor_csr.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
            ]
        if hasattr(lib, "tri_levels"):
            lib.tri_levels.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
            ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _prep(a) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.int64)
    return a.reshape(len(a), -1) if a.ndim > 1 else a.reshape(-1, 1)


def hash_join_rows(table, query) -> np.ndarray:
    """Index of each query row in table (first match), or -1; (n_query,)."""
    table, query = _prep(table), _prep(query)
    if table.shape[1] != query.shape[1]:
        raise ValueError("table and query must have the same row width")
    k = table.shape[1]
    lib = _load()
    if lib:
        out = np.empty(len(query), dtype=np.int64)
        lib.hash_join_rows(_ptr(table), len(table), _ptr(query), len(query), k, _ptr(out))
        return out
    return _np_join(table, query)


def _np_join(table: np.ndarray, query: np.ndarray) -> np.ndarray:
    k = table.shape[1]
    dt = np.dtype([("", np.int64)] * k)
    tv = np.ascontiguousarray(table).view(dt).reshape(-1)
    qv = np.ascontiguousarray(query).view(dt).reshape(-1)
    order = np.argsort(tv, kind="stable")
    ts = tv[order]
    pos = np.searchsorted(ts, qv)
    pos_c = np.minimum(pos, len(ts) - 1) if len(ts) else pos
    ok = (pos < len(ts)) & (ts[pos_c] == qv) if len(ts) else np.zeros(len(qv), bool)
    # first occurrence: among equal table rows, argsort(stable) keeps order
    return np.where(ok, order[pos_c], -1)


def unique_rows(rows) -> tuple[np.ndarray, np.ndarray]:
    """(first-occurrence indices of unique rows, inverse ids per row)."""
    rows = _prep(rows)
    lib = _load()
    if lib:
        uniq_idx = np.empty(len(rows), dtype=np.int64)
        inverse = np.empty(len(rows), dtype=np.int64)
        n = lib.unique_rows(_ptr(rows), len(rows), rows.shape[1], _ptr(uniq_idx), _ptr(inverse))
        return uniq_idx[:n].copy(), inverse
    _, idx, inv = np.unique(rows, axis=0, return_index=True, return_inverse=True)
    # np.unique sorts; re-map to first-occurrence order for a stable contract
    order = np.argsort(idx, kind="stable")
    remap = np.empty_like(order)
    remap[order] = np.arange(len(order))
    return idx[order], remap[inv.reshape(-1)]


def match_rows(table, query) -> np.ndarray:
    """Alias of hash_join_rows (readability at call sites)."""
    return hash_join_rows(table, query)


def ilu0_factor_csr(data, indices, indptr, n: int) -> np.ndarray | None:
    """Native zero-fill ILU on the CSR's sparsity; factored values, or None
    when the library is unavailable (callers fall back to the numpy loop).
    Raises on zero pivots / missing diagonals like the numpy path."""
    lib = _load()
    if not lib or not hasattr(lib, "ilu0_factor_csr"):
        return None
    a = np.array(data, dtype=np.float64, copy=True)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    ptr = np.ascontiguousarray(indptr, dtype=np.int64)
    rc = lib.ilu0_factor_csr(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), _ptr(idx), _ptr(ptr), int(n)
    )
    if rc == np.iinfo(np.int64).min:
        raise ValueError("ILU0 requires explicit diagonal entries")
    if rc < 0:
        raise ZeroDivisionError(f"ILU0 breakdown: zero pivot at row {-int(rc) - 1}")
    return a


def tri_levels(indices, indptr, n: int, lower: bool) -> np.ndarray | None:
    """Native topological levels for a level-scheduled triangular solve,
    or None when the library is unavailable (callers use the numpy loop)."""
    lib = _load()
    if not lib or not hasattr(lib, "tri_levels"):
        return None
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    ptr = np.ascontiguousarray(indptr, dtype=np.int64)
    out = np.zeros(int(n), dtype=np.int64)
    lib.tri_levels(_ptr(idx), _ptr(ptr), int(n), 1 if lower else 0, _ptr(out))
    return out
