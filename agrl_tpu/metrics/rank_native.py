"""ctypes bindings for the native C++ ranking extension.

Role parity with the reference's rank_cylib import shim
(torchreid/metrics/rank.py:11-19): if the shared library is missing the
caller falls back to the NumPy implementations. Build with
`make -C native` (repo root).
"""

from __future__ import annotations

import ctypes
import os.path as osp

import numpy as np

_LIB_PATHS = [
    osp.join(osp.dirname(__file__), "..", "..", "native", "librank_eval.so"),
    osp.join(osp.dirname(__file__), "librank_eval.so"),
]


def _load():
    for p in _LIB_PATHS:
        if osp.exists(p):
            lib = ctypes.CDLL(osp.abspath(p))
            f64 = ctypes.POINTER(ctypes.c_float)
            i64 = ctypes.POINTER(ctypes.c_int64)
            u8 = ctypes.POINTER(ctypes.c_uint8)
            lib.evaluate_mars_c.argtypes = [
                f64, i64, i64, i64, i64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64, f64,
            ]
            lib.evaluate_market1501_c.argtypes = [
                f64, i64, i64, i64, i64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64, f64, u8,
            ]
            return lib
    return None


_lib = _load()
IS_NATIVE_AVAILABLE = _lib is not None


def _prep(distmat, q_pids, g_pids, q_camids, g_camids):
    dm = np.ascontiguousarray(distmat, dtype=np.float32)
    arrs = [
        np.ascontiguousarray(a, dtype=np.int64)
        for a in (q_pids, g_pids, q_camids, g_camids)
    ]
    return dm, arrs


def evaluate_mars_native(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    assert IS_NATIVE_AVAILABLE, "librank_eval.so not built (run `make -C native`)"
    dm, (qp, gp, qc, gc) = _prep(distmat, q_pids, g_pids, q_camids, g_camids)
    Q, G = dm.shape
    cmc = np.zeros((Q, max_rank), dtype=np.float32)
    ap = np.zeros(Q, dtype=np.float32)
    c_f = ctypes.POINTER(ctypes.c_float)
    c_i = ctypes.POINTER(ctypes.c_int64)
    _lib.evaluate_mars_c(
        dm.ctypes.data_as(c_f),
        qp.ctypes.data_as(c_i), gp.ctypes.data_as(c_i),
        qc.ctypes.data_as(c_i), gc.ctypes.data_as(c_i),
        Q, G, max_rank,
        cmc.ctypes.data_as(c_f), ap.ctypes.data_as(c_f),
    )
    return cmc.mean(axis=0).astype(np.float64), float(ap.mean())


def evaluate_market1501_native(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    assert IS_NATIVE_AVAILABLE, "librank_eval.so not built (run `make -C native`)"
    dm, (qp, gp, qc, gc) = _prep(distmat, q_pids, g_pids, q_camids, g_camids)
    Q, G = dm.shape
    max_rank = min(max_rank, G)
    cmc = np.zeros((Q, max_rank), dtype=np.float32)
    ap = np.zeros(Q, dtype=np.float32)
    valid = np.zeros(Q, dtype=np.uint8)
    c_f = ctypes.POINTER(ctypes.c_float)
    c_i = ctypes.POINTER(ctypes.c_int64)
    c_u = ctypes.POINTER(ctypes.c_uint8)
    _lib.evaluate_market1501_c(
        dm.ctypes.data_as(c_f),
        qp.ctypes.data_as(c_i), gp.ctypes.data_as(c_i),
        qc.ctypes.data_as(c_i), gc.ctypes.data_as(c_i),
        Q, G, max_rank,
        cmc.ctypes.data_as(c_f), ap.ctypes.data_as(c_f), valid.ctypes.data_as(c_u),
    )
    n_valid = valid.sum()
    assert n_valid > 0, "Error: all query identities do not appear in gallery"
    mask = valid.astype(bool)
    return cmc[mask].mean(axis=0).astype(np.float32), float(ap[mask].mean())
