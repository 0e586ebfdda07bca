"""ctypes bindings for the native C++ runtime (native/scema_native.cpp).

Loads libscema_native.so if present (built with ``make -C native``);
every entry point has a pure-Python fallback, so the framework works
without the native build and tests can compare both paths.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = [
        os.path.join(here, "native", "libscema_native.so"),
        os.path.join(here, "libscema_native.so"),
    ]
    for c in cands:
        if os.path.exists(c):
            return c
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.msh_parse.restype = ctypes.c_void_p
    lib.msh_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.msh_get.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.msh_free.argtypes = [ctypes.c_void_p]
    lib.reduce_graph.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.write_vtu_binary.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def read_msh_native(path: str):
    """Native gmsh parser; returns (nodes, cells) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nn = ctypes.c_int64()
    nc = ctypes.c_int64()
    handle = lib.msh_parse(path.encode(), ctypes.byref(nn), ctypes.byref(nc))
    if not handle:
        return None
    nodes = np.empty((nn.value, 3), dtype=np.float64)
    cells = np.empty((nc.value, 8), dtype=np.int32)
    lib.msh_get(
        handle,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    lib.msh_free(handle)
    return nodes, cells


def reduce_graph_native(adj: np.ndarray):
    """Native greedy reduction; returns mapping or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = adj.shape[0]
    adj8 = np.ascontiguousarray(adj.astype(np.uint8))
    mapping = np.empty(n, dtype=np.int32)
    lib.reduce_graph(
        n,
        adj8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mapping.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return mapping


def write_vtu_native(path, nodes, cells, point_data=None, cell_data=None):
    """Native binary-appended .vtu writer; returns False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    nodes = np.ascontiguousarray(np.asarray(nodes, dtype=np.float64))
    cells = np.ascontiguousarray(np.asarray(cells, dtype=np.int32))

    def prep(data, n_expected):
        names, ncomps, ptrs, keep = [], [], [], []
        for name, arr in (data or {}).items():
            arr = np.ascontiguousarray(np.asarray(arr, dtype=np.float64))
            if arr.ndim == 1:
                arr = arr[:, None]
            assert arr.shape[0] == n_expected
            keep.append(arr)
            names.append(name.encode())
            ncomps.append(arr.shape[1])
            ptrs.append(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        n = len(names)
        return (
            n,
            (ctypes.c_char_p * n)(*names),
            np.asarray(ncomps, dtype=np.int32),
            (ctypes.POINTER(ctypes.c_double) * n)(*ptrs),
            keep,
        )

    npf, pnames, pncomp, pptrs, keep1 = prep(point_data, len(nodes))
    ncf, cnames, cncomp, cptrs, keep2 = prep(cell_data, len(cells))
    ret = lib.write_vtu_binary(
        path.encode(),
        len(nodes),
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(cells),
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        npf,
        pnames,
        pncomp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pptrs,
        ncf,
        cnames,
        cncomp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cptrs,
    )
    return ret == 0
