"""ctypes loader for the native host runtime (libquiver_host.so).

Builds the shared library on first use (g++ -O3, no external deps) and
caches it next to the source; every entry point has a numpy fallback so
the package works without a toolchain. The native layer is the TPU
system's equivalent of the reference's C++ components that live on the
host (CSR build, CPU sampling for the serving workers, cold-tier
gather) — the device path is XLA/Pallas.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libquiver_host.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = _HERE / "quiver_host.cpp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", str(src), "-o", str(_LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src = _HERE / "quiver_host.cpp"
        stale = (_LIB_PATH.exists()
                 and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)
        if not _LIB_PATH.exists() or stale:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.qt_coo_to_csr.argtypes = [i64p, i64p, ctypes.c_int64,
                                      ctypes.c_int64, i64p, i32p, i64p]
        lib.qt_sample_rows.argtypes = [i64p, i32p, i64p, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_uint64,
                                       i32p, i64p, u8p]
        lib.qt_gather_rows.argtypes = [u8p, i64p, ctypes.c_int64,
                                       ctypes.c_int64, u8p]
        lib.qt_shuffle_rows.argtypes = [i64p, ctypes.c_int64,
                                        ctypes.c_uint64, i32p, i64p]
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.qt_build_alias.argtypes = [i64p, f32p, ctypes.c_int64,
                                       f32p, i32p]
        lib.qt_build_blocks.argtypes = [i64p, i32p, ctypes.c_int64,
                                        ctypes.c_int32, i32p]
        lib.qt_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def coo_to_csr(row, col, num_nodes):
    """Threaded COO->CSR (counting sort, stable intra-row order, eid)."""
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    E, V = row.shape[0], int(num_nodes)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    indptr = np.zeros(V + 1, np.int64)
    indices = np.zeros(E, np.int32)
    eid = np.zeros(E, np.int64)
    lib.qt_coo_to_csr(_p(row, ctypes.c_int64), _p(col, ctypes.c_int64),
                      E, V, _p(indptr, ctypes.c_int64),
                      _p(indices, ctypes.c_int32), _p(eid, ctypes.c_int64))
    return indptr, indices, eid


def sample_rows(indptr, indices, seeds, k: int, seed: int = 0):
    """Uniform k-subset per seed row -> (nbr [n,k] i32, slot [n,k] i64,
    mask [n,k] bool), dense positional contract."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = seeds.shape[0]
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nbr = np.zeros((n, k), np.int32)
    slot = np.zeros((n, k), np.int64)
    mask = np.zeros((n, k), np.uint8)
    lib.qt_sample_rows(_p(indptr, ctypes.c_int64),
                       _p(indices, ctypes.c_int32),
                       _p(seeds, ctypes.c_int64), n, k, seed,
                       _p(nbr, ctypes.c_int32), _p(slot, ctypes.c_int64),
                       _p(mask, ctypes.c_uint8))
    return nbr, slot, mask.astype(bool)


def gather_rows(table, ids):
    """Threaded host row gather: out[i] = table[ids[i]]."""
    table = np.ascontiguousarray(table)
    ids = np.ascontiguousarray(ids, np.int64)
    lib = get_lib()
    if lib is None:
        return table[ids]
    out = np.empty((ids.shape[0],) + table.shape[1:], table.dtype)
    row_bytes = table.itemsize * int(np.prod(table.shape[1:], initial=1))
    tb = table.view(np.uint8).reshape(table.shape[0], -1)
    ob = out.view(np.uint8).reshape(out.shape[0], -1)
    lib.qt_gather_rows(_p(tb, ctypes.c_uint8), _p(ids, ctypes.c_int64),
                       ids.shape[0], row_bytes, _p(ob, ctypes.c_uint8))
    return out


def build_alias(indptr, weights):
    """Per-row Vose alias tables -> (prob f32[E], alias i32[E]),
    CSR-slot aligned; alias entries are row-relative positions."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    weights = np.ascontiguousarray(weights, np.float32)
    E = weights.shape[0]
    V = indptr.shape[0] - 1
    lib = get_lib()
    prob = np.ones(E, np.float32)
    alias = np.zeros(E, np.int32)
    if lib is None:
        # numpy fallback: per-row Vose (slow python loop; small graphs)
        for v in range(V):
            s, e = indptr[v], indptr[v + 1]
            n = e - s
            if n == 0:
                continue
            w = weights[s:e].astype(np.float64)
            tot = w.sum()
            if tot <= 0:
                alias[s:e] = np.arange(n)
                continue
            p = (w / tot * n).tolist()
            small = [i for i in range(n) if p[i] < 1.0]
            large = [i for i in range(n) if p[i] >= 1.0]
            while small and large:
                sm, lg = small.pop(), large.pop()
                prob[s + sm] = p[sm]
                alias[s + sm] = lg
                p[lg] = (p[lg] + p[sm]) - 1.0
                (small if p[lg] < 1.0 else large).append(lg)
            for i in small + large:
                prob[s + i] = 1.0
                alias[s + i] = i
        return prob, alias
    ctypes_f32 = ctypes.c_float
    lib.qt_build_alias(_p(indptr, ctypes.c_int64),
                       _p(weights, ctypes_f32), V,
                       _p(prob, ctypes_f32), _p(alias, ctypes.c_int32))
    return prob, alias


def build_blocks(indptr, indices, lanes: int):
    """Threaded [V, lanes] block-layout builder for block-exact sampling
    (header (start, deg) + first lanes-2 neighbors per row). Chunked
    numpy fallback bounds peak memory when the library is unavailable."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    V = indptr.shape[0] - 1
    W = int(lanes)
    out = np.zeros((V, W), np.int32)
    lib = get_lib()
    if lib is not None:
        lib.qt_build_blocks(_p(indptr, ctypes.c_int64),
                            _p(indices, ctypes.c_int32), V, W,
                            _p(out, ctypes.c_int32))
        return out
    E = indices.shape[0]
    if E == 0:
        return out
    j = np.arange(W - 2, dtype=np.int64)[None, :]
    chunk = max(1, (64 << 20) // (W * 8))
    for lo in range(0, V, chunk):
        hi = min(lo + chunk, V)
        start = indptr[lo:hi]
        deg = (indptr[lo + 1:hi + 1] - start).astype(np.int32)
        out[lo:hi, 0] = start.astype(np.int32)
        out[lo:hi, 1] = deg
        flat = np.minimum(start[:, None] + j, E - 1)
        out[lo:hi, 2:] = np.where(j < deg[:, None], indices[flat], 0)
    return out


def shuffle_rows(indptr, indices, eid=None, seed: int = 0):
    """In-place per-row shuffle of CSR indices (+eid) for window sampling."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = get_lib()
    if lib is None:
        rng = np.random.default_rng(seed)
        for v in range(indptr.shape[0] - 1):
            s, e = indptr[v], indptr[v + 1]
            perm = rng.permutation(e - s)
            indices[s:e] = indices[s:e][perm]
            if eid is not None:
                eid[s:e] = eid[s:e][perm]
        return indices, eid
    ep = _p(eid, ctypes.c_int64) if eid is not None else None
    if eid is not None:
        eid = np.ascontiguousarray(eid, np.int64)
        ep = _p(eid, ctypes.c_int64)
    lib.qt_shuffle_rows(_p(indptr, ctypes.c_int64), indptr.shape[0] - 1,
                        seed, _p(indices, ctypes.c_int32), ep)
    return indices, eid
