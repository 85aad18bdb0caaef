"""ctypes bindings for the native host-side graph preprocessing library.

Compiles native/graphlib.cpp on first use (g++, cached next to the source);
every entry point has a pure-numpy fallback so the framework runs without a
toolchain. ``available()`` reports whether the native path loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphlib.cpp")
_BUILD_DIR = os.path.join(_DIR, "build")  # not a package: keeps the .so out
# of pkgutil's module discovery (a bare .so in the package dir would be
# imported as an extension module and fail)
_SO = os.path.join(_BUILD_DIR, "libgraphlib.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=240,
        )
        return _SO
    except Exception:
        return None


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i64, i32p, f32p = ctypes.c_int64, np.ctypeslib.ndpointer(np.int32), \
            np.ctypeslib.ndpointer(np.float32)
        lib.csr_layout_capacity.restype = i64
        lib.csr_layout_capacity.argtypes = [i64] * 4
        lib.csr_layout_build.restype = i64
        lib.csr_layout_build.argtypes = [
            i32p, i32p, i32p, i32p, i64, i64, i64, i64,
            i32p, i32p, i32p, i32p, i32p, f32p, i32p,
        ]
        lib.relation_graph_patterns.restype = i64
        lib.relation_graph_patterns.argtypes = [
            i32p, i32p, i32p, i64, i64, i64, ctypes.c_void_p,
        ]
        lib.degree_balanced_lpt.restype = None
        lib.degree_balanced_lpt.argtypes = [
            np.ctypeslib.ndpointer(np.int64), i64, i64, i64, i32p,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def csr_layout_build_native(
    row_ids: np.ndarray,
    gather1: np.ndarray,
    gather2: Optional[np.ndarray],
    aux: np.ndarray,
    num_rows: int,
    tile_rows: int,
    tile_edges: int,
):
    """Returns (E2, gather1, gather2, aux, row_local, edge_id, valid,
    chunk_row) as numpy arrays, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    E = len(row_ids)
    cap = lib.csr_layout_capacity(E, num_rows, tile_rows, tile_edges)
    og1 = np.empty(cap, np.int32)
    og2 = np.empty(cap, np.int32)
    oaux = np.empty(cap, np.int32)
    orl = np.empty(cap, np.int32)
    oeid = np.empty(cap, np.int32)
    oval = np.empty(cap, np.float32)
    ocr = np.empty(cap // tile_edges + 1, np.int32)
    g2 = gather2 if gather2 is not None else np.zeros(E, np.int32)
    E2 = lib.csr_layout_build(
        np.ascontiguousarray(row_ids, np.int32),
        np.ascontiguousarray(gather1, np.int32),
        np.ascontiguousarray(g2, np.int32),
        np.ascontiguousarray(aux, np.int32),
        E, num_rows, tile_rows, tile_edges,
        og1, og2, oaux, orl, oeid, oval, ocr,
    )
    C = E2 // tile_edges
    return (
        E2, og1[:E2], og2[:E2], oaux[:E2], orl[:E2], oeid[:E2], oval[:E2],
        ocr[:C],
    )


def degree_balanced_lpt_native(
    deg: np.ndarray, n_blocks: int, v_block: int
) -> Optional[np.ndarray]:
    """int32 [V] new id per node (see parallel/balance.py), or None if the
    native lib is unavailable. Bit-identical to the Python fallback."""
    lib = _load()
    if lib is None:
        return None
    deg = np.ascontiguousarray(deg, np.int64)
    to_new = np.empty(len(deg), np.int32)
    lib.degree_balanced_lpt(deg, len(deg), n_blocks, v_block, to_new)
    return to_new


def relation_graph_patterns_native(
    heads: np.ndarray, tails: np.ndarray, rels: np.ndarray,
    num_nodes: int, num_rels: int,
) -> Optional[np.ndarray]:
    """[N, 3] (r1, r2, etype) pattern triples, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = np.ascontiguousarray(heads, np.int32)
    t = np.ascontiguousarray(tails, np.int32)
    r = np.ascontiguousarray(rels, np.int32)
    n = lib.relation_graph_patterns(h, t, r, len(h), num_nodes, num_rels, None)
    out = np.empty((n, 3), np.int32)
    lib.relation_graph_patterns(
        h, t, r, len(h), num_nodes, num_rels,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
