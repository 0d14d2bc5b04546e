"""Native host-side preprocessing library (C++ via ctypes).

Auto-builds ``libsessiongraph.so`` with the system toolchain on first
use and falls back silently to the numpy implementations when no
compiler is available (``native_available()`` reports the state).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libsessiongraph.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_SO) or (
            os.path.getmtime(_SO) <
            os.path.getmtime(os.path.join(_DIR, "session_graph.cpp"))):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.build_session_graphs.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32,
        i32p, i32p, i32p, i32p, i32p, i32p, ctypes.c_int32]
    lib.build_session_graphs.restype = None
    lib.kcore_filter.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p]
    lib.kcore_filter.restype = ctypes.c_int64
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def build_session_graphs_native(seqs: np.ndarray, lengths: np.ndarray,
                                n_threads: int = 0):
    """Native equivalent of data/session.py's unique/alias/edge build.

    Returns (x, n_nodes, alias, edge_src, edge_dst, n_edges) or None if
    the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    seqs = np.ascontiguousarray(seqs, dtype=np.int32)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    n, L = seqs.shape
    x = np.zeros((n, L), np.int32)
    n_nodes = np.zeros(n, np.int32)
    alias = np.zeros((n, L), np.int32)
    esrc = np.zeros((n, L), np.int32)
    edst = np.zeros((n, L), np.int32)
    n_edges = np.zeros(n, np.int32)
    lib.build_session_graphs(
        _ptr(seqs, ctypes.c_int32), _ptr(lengths, ctypes.c_int32),
        ctypes.c_int64(n), ctypes.c_int32(L),
        _ptr(x, ctypes.c_int32), _ptr(n_nodes, ctypes.c_int32),
        _ptr(alias, ctypes.c_int32), _ptr(esrc, ctypes.c_int32),
        _ptr(edst, ctypes.c_int32), _ptr(n_edges, ctypes.c_int32),
        ctypes.c_int32(n_threads))
    return x, n_nodes, alias, esrc, edst, n_edges


def kcore_filter_native(users: np.ndarray, items: np.ndarray,
                        n_users: int, n_items: int,
                        u_min: int, u_max: int, i_min: int, i_max: int):
    """Native fixed-point k-core; returns bool keep mask or None."""
    lib = _load()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    keep = np.zeros(len(users), np.uint8)
    lib.kcore_filter(
        _ptr(users, ctypes.c_int64), _ptr(items, ctypes.c_int64),
        ctypes.c_int64(len(users)), ctypes.c_int64(n_users),
        ctypes.c_int64(n_items), ctypes.c_int64(u_min),
        ctypes.c_int64(u_max), ctypes.c_int64(i_min),
        ctypes.c_int64(i_max), _ptr(keep, ctypes.c_uint8))
    return keep.astype(bool)
