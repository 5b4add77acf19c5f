"""Native (C++) host kernels, loaded via ctypes.

Build happens lazily on first import (g++ -O3 -shared); the .so is
cached next to the sources. Every consumer falls back to its pure-
Python path when compilation is unavailable, so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.join(_DIR, "coco_match.cc")
    so = os.path.join(_DIR, "libwedetect_native.so")
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so, src],
            check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
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
            lib.coco_match.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.coco_match.restype = None
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def coco_match(iou, gt_ig, crowd, thrs):
    """Native greedy matching. Returns (dtm (T, nd), gtm (T, ng)) or
    None when the native library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    nd, ng = iou.shape
    nt = len(thrs)
    iou = np.ascontiguousarray(iou, np.float64)
    gt_ig = np.ascontiguousarray(gt_ig, np.uint8)
    crowd = np.ascontiguousarray(crowd, np.uint8)
    thrs = np.ascontiguousarray(thrs, np.float64)
    dtm = np.empty((nt, nd), np.int64)
    gtm = np.empty((nt, ng), np.int64)
    p = ctypes.POINTER
    lib.coco_match(
        iou.ctypes.data_as(p(ctypes.c_double)), nd, ng,
        gt_ig.ctypes.data_as(p(ctypes.c_uint8)),
        crowd.ctypes.data_as(p(ctypes.c_uint8)),
        thrs.ctypes.data_as(p(ctypes.c_double)), nt,
        dtm.ctypes.data_as(p(ctypes.c_int64)),
        gtm.ctypes.data_as(p(ctypes.c_int64)))
    return dtm, gtm
