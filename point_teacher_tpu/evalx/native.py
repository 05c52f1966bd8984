"""ctypes bindings for the native evaluation core (ccore/libptteval.so).

Build once with `sh ccore/build.sh`; every entry point transparently falls
back to the numpy implementation when the library is absent. The native core
covers the host-side evaluation hot loops (greedy COCO matching, rotated IoU,
rotated NMS) that the reference obtains from aitodpycocotools / mmcv C++.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "ccore", "libptteval.so")
    path = os.path.abspath(path)
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        lib.iou_xyxy.argtypes = [f32p, i64, f32p, i64, f32p]
        lib.match_greedy.argtypes = [f32p, i64, i64, u8p, ctypes.c_float, f32p, u8p]
        lib.rbox_iou.argtypes = [f32p, i64, f32p, i64, f32p]
        lib.nms_rotated.argtypes = [f32p, f32p, i64, ctypes.c_float, u8p]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def iou_xyxy(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None or len(d) == 0 or len(g) == 0:
        from .cocoeval import _iou_xyxy
        return _iou_xyxy(d, g)
    d = np.ascontiguousarray(d[:, :4], np.float32)
    g = np.ascontiguousarray(g[:, :4], np.float32)
    out = np.empty((len(d), len(g)), np.float32)
    lib.iou_xyxy(_fp(d), len(d), _fp(g), len(g), _fp(out))
    return out.astype(np.float64)


def match_greedy(iou: np.ndarray, gt_ignore: np.ndarray, thr: float):
    """Returns (dt_iou [M], dt_ig [M] bool). Native or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    m, n = iou.shape
    iou_c = np.ascontiguousarray(iou, np.float32)
    gi = np.ascontiguousarray(gt_ignore, np.uint8)
    dt_iou = np.empty(m, np.float32)
    dt_ig = np.empty(m, np.uint8)
    lib.match_greedy(_fp(iou_c), m, n, _up(gi), ctypes.c_float(thr), _fp(dt_iou),
                     _up(dt_ig))
    return dt_iou.astype(np.float64), dt_ig.astype(bool)


def rbox_iou(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None or len(d) == 0 or len(g) == 0:
        from .rgeometry import rbox_iou_np
        return rbox_iou_np(d, g)
    d = np.ascontiguousarray(d[:, :5], np.float32)
    g = np.ascontiguousarray(g[:, :5], np.float32)
    out = np.empty((len(d), len(g)), np.float32)
    lib.rbox_iou(_fp(d), len(d), _fp(g), len(g), _fp(out))
    return out.astype(np.float64)


def nms_rotated(rboxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        from .rgeometry import nms_rotated_np
        return nms_rotated_np(rboxes, scores, iou_thr)
    rb = np.ascontiguousarray(rboxes[:, :5], np.float32)
    sc = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(rb), np.uint8)
    lib.nms_rotated(_fp(rb), _fp(sc), len(rb), ctypes.c_float(iou_thr), _up(keep))
    idx = np.nonzero(keep)[0]
    order = np.argsort(-sc[idx], kind="stable")
    return idx[order]
