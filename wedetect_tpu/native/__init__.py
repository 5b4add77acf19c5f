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


_SOURCES = ("coco_match.cc", "image_pipeline.cc")


def _compile(srcs, out, extra) -> bool:
    """g++ to a pid-suffixed temp path, then atomically rename into
    place — a concurrent builder in another process (eval sharding
    spawns several) can never leave a torn .so at `out`."""
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", tmp] + srcs + extra
    try:
        subprocess.run(cmd, check=True, capture_output=True,
                       timeout=120)
        os.rename(tmp, out)   # atomic on the same filesystem
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _build() -> Optional[str]:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    so = os.path.join(_DIR, "libwedetect_native.so")
    marker = so + ".nojpeg"   # records a libjpeg-less fallback build
    fresh = (os.path.exists(so)
             and all(os.path.getmtime(so) >= os.path.getmtime(s)
                     for s in srcs))
    if fresh and not os.path.exists(marker):
        return so
    # serialize builders across processes (threads already hold _LOCK)
    lockf = open(so + ".lock", "w")
    try:
        try:
            import fcntl
            fcntl.flock(lockf, fcntl.LOCK_EX)
        except Exception:
            pass   # no fcntl: atomic rename alone still prevents tears
        # re-check under the lock: another process may have just built
        fresh = (os.path.exists(so)
                 and all(os.path.getmtime(so) >= os.path.getmtime(s)
                         for s in srcs))
        if fresh and not os.path.exists(marker):
            return so
        if _compile(srcs, so, ["-ljpeg"]):
            if os.path.exists(marker):  # libjpeg appeared: full build
                os.remove(marker)
            return so
        if fresh:
            return so   # keep the cached fallback; retry full next time
        # no libjpeg dev files: keep the dependency-free kernels
        # working (image fns report unavailable; callers fall back)
        if _compile([srcs[0]], so, []):
            with open(marker, "w"):
                pass
            return so
        return None
    finally:
        lockf.close()


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
        except OSError:
            _LIB = None
            return _LIB
        try:
            lib.coco_match.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.coco_match.restype = None
        except AttributeError:
            pass  # stale .so without this symbol: skip it
        try:
            lib.wd_decode_letterbox.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.wd_decode_letterbox.restype = ctypes.c_int
            if hasattr(lib, "wd_decode_letterbox_fast"):
                lib.wd_decode_letterbox_fast.argtypes = \
                    lib.wd_decode_letterbox.argtypes
                lib.wd_decode_letterbox_fast.restype = ctypes.c_int
            lib.wd_jpeg_info.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.wd_jpeg_info.restype = ctypes.c_int
            lib.wd_decode_jpeg.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.wd_decode_jpeg.restype = ctypes.c_int
        except AttributeError:
            pass  # built without libjpeg (or stale .so): no image fns
        _LIB = lib
        return _LIB


def coco_match(iou, gt_ig, crowd, thrs):
    """Native greedy matching. Returns (dtm (T, nd), gtm (T, ng)) or
    None when the native library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None or not hasattr(lib, "coco_match"):
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


def decode_letterbox(jpeg_bytes: bytes, scale, pad_val: int = 114,
                     fast: bool = False):
    """Fused native JPEG decode + keep-ratio + letterbox.

    scale: (th, tw). Returns (padded u8 HWC RGB, scale_factor (w, h)
    f32, pad_param [t, b, l, r] f32, ori_shape (h, w)) — the
    ops/letterbox.preprocess_image contract — or None when the native
    library is unavailable or the bytes fail to decode (caller falls
    back to the cv2 path). Releases the GIL: thread pools parallelize.

    fast=True engages libjpeg DCT-scaled decode (1/2, 1/4, 1/8) when
    the keep-ratio target is >=2x smaller than the source — ~denom^2
    less decode work, numerically close but not bit-identical to the
    exact path (the scale/pad metadata stays exact).
    """
    import numpy as np

    lib = get_lib()
    if lib is None or not hasattr(lib, "wd_decode_letterbox"):
        return None
    fn = (lib.wd_decode_letterbox_fast
          if fast and hasattr(lib, "wd_decode_letterbox_fast")
          else lib.wd_decode_letterbox)
    th, tw = int(scale[0]), int(scale[1])
    buf = np.frombuffer(jpeg_bytes, np.uint8)
    out = np.empty((th, tw, 3), np.uint8)
    sf = np.empty(2, np.float32)
    pad = np.empty(4, np.float32)
    ori = np.empty(2, np.int32)
    p = ctypes.POINTER
    rc = fn(
        buf.ctypes.data_as(p(ctypes.c_uint8)), len(jpeg_bytes),
        th, tw, pad_val, out.ctypes.data_as(p(ctypes.c_uint8)),
        sf.ctypes.data_as(p(ctypes.c_float)),
        pad.ctypes.data_as(p(ctypes.c_float)),
        ori.ctypes.data_as(p(ctypes.c_int)))
    if rc != 0:
        return None
    return out, sf, pad, (int(ori[0]), int(ori[1]))


def decode_jpeg(jpeg_bytes: bytes):
    """Native JPEG decode to RGB u8 HWC, or None (fallback)."""
    import numpy as np

    lib = get_lib()
    if lib is None or not hasattr(lib, "wd_jpeg_info"):
        return None
    buf = np.frombuffer(jpeg_bytes, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    p = ctypes.POINTER
    if lib.wd_jpeg_info(buf.ctypes.data_as(p(ctypes.c_uint8)),
                        len(jpeg_bytes), ctypes.byref(h),
                        ctypes.byref(w)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.wd_decode_jpeg(buf.ctypes.data_as(p(ctypes.c_uint8)),
                          len(jpeg_bytes),
                          out.ctypes.data_as(p(ctypes.c_uint8))):
        return None
    return out
