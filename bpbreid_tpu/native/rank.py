"""ctypes wrapper around the native C++ ranking kernel (rank.cpp).

Builds ``librank.so`` on first use with g++ (cached next to the source);
falls back silently when no compiler is available — callers check
``is_available()``. The analogue of the reference's Cython module
(torchreid/metrics/rank_cylib/) with a multithreaded single-pass
CMC+AP accumulation.
"""
import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, 'rank.cpp')
_SO = osp.join(_HERE, 'librank.so')
_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
           _SRC, '-o', _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not osp.exists(_SO) or osp.getmtime(_SO) < osp.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.eval_market1501.restype = ctypes.c_int
        lib.eval_market1501.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.eval_cuhk03.restype = ctypes.c_int
        lib.eval_cuhk03.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def is_available():
    return _load() is not None


def eval_market1501(distmat, q_pids, g_pids, q_camids, g_camids, max_rank,
                    num_threads=0):
    """Drop-in replacement for metrics.rank.eval_market1501."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native ranking kernel unavailable')
    distmat = np.ascontiguousarray(distmat, dtype=np.float32)
    q_pids = np.ascontiguousarray(q_pids, dtype=np.int64)
    g_pids = np.ascontiguousarray(g_pids, dtype=np.int64)
    q_camids = np.ascontiguousarray(q_camids, dtype=np.int64)
    g_camids = np.ascontiguousarray(g_camids, dtype=np.int64)
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    cmc = np.zeros(max_rank, dtype=np.float32)
    mAP = ctypes.c_double(0.0)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    ret = lib.eval_market1501(
        ptr(distmat, ctypes.c_float), ptr(q_pids, ctypes.c_int64),
        ptr(g_pids, ctypes.c_int64), ptr(q_camids, ctypes.c_int64),
        ptr(g_camids, ctypes.c_int64), num_q, num_g, max_rank,
        ptr(cmc, ctypes.c_float), ctypes.byref(mAP), num_threads)
    if ret != 0:
        raise RuntimeError(
            'Error: all query identities do not appear in gallery')
    return {'cmc': cmc, 'mAP': float(mAP.value)}


def eval_cuhk03(distmat, q_pids, g_pids, q_camids, g_camids, max_rank,
                num_repeats=10, seed=0, num_threads=0):
    """Native CUHK03 single-gallery-shot protocol (rank.cpp eval_cuhk03).

    Deterministic for a given ``seed`` at any thread count (counter-based
    per-(query, repeat, group) RNG). The sampling stream differs from the
    numpy implementation's, so CMC values agree with
    metrics.rank.eval_cuhk03 in distribution (and as num_repeats grows),
    while mAP is exact.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError('native ranking kernel unavailable')
    distmat = np.ascontiguousarray(distmat, dtype=np.float32)
    q_pids = np.ascontiguousarray(q_pids, dtype=np.int64)
    g_pids = np.ascontiguousarray(g_pids, dtype=np.int64)
    q_camids = np.ascontiguousarray(q_camids, dtype=np.int64)
    g_camids = np.ascontiguousarray(g_camids, dtype=np.int64)
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    cmc = np.zeros(max_rank, dtype=np.float32)
    mAP = ctypes.c_double(0.0)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    ret = lib.eval_cuhk03(
        ptr(distmat, ctypes.c_float), ptr(q_pids, ctypes.c_int64),
        ptr(g_pids, ctypes.c_int64), ptr(q_camids, ctypes.c_int64),
        ptr(g_camids, ctypes.c_int64), num_q, num_g, max_rank,
        num_repeats, seed, ptr(cmc, ctypes.c_float), ctypes.byref(mAP),
        num_threads)
    if ret != 0:
        raise RuntimeError(
            'Error: all query identities do not appear in gallery')
    return {'cmc': cmc, 'mAP': float(mAP.value)}
