"""ctypes bindings for the native host ops (host_ops.cpp).

The shared object is built lazily with g++ on first use and cached next
to the source; everything degrades to numpy fallbacks when no compiler
is available.  API mirrors the reference host kernels (cpu NMS,
bbox.pyx overlaps) with numpy arrays in and out.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, 'host_ops.cpp')
_SO = osp.join(_HERE, '_host_ops.so')
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if os.environ.get('DANA_NO_NATIVE'):    # numpy-fallback A/B switch
        return None
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not osp.exists(_SO) or \
                    os.stat(_SRC).st_mtime > os.stat(_SO).st_mtime:
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
                     _SRC, '-o', _SO], check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.bbox_overlaps.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            lib.greedy_nms.restype = ctypes.c_int64
            lib.greedy_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64]
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.meansub_u8.argtypes = [u8p, ctypes.c_int64, f32p, f32p]
            lib.meansub_f32.argtypes = [f32p, ctypes.c_int64, f32p, f32p]
            lib.pad_s2d_f32.argtypes = [
                f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, f32p, f32p]
            lib.pad_s2d_u8.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, u8p, u8p]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return _load() is not None


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Pairwise IoU [N, K] (legacy +1 convention)."""
    boxes = np.ascontiguousarray(boxes[:, :4], np.float32)
    query = np.ascontiguousarray(query[:, :4], np.float32)
    lib = _load()
    if lib is None:
        return _bbox_overlaps_np(boxes, query)
    out = np.empty((len(boxes), len(query)), np.float32)
    lib.bbox_overlaps(_fptr(boxes), len(boxes), _fptr(query), len(query),
                      _fptr(out))
    return out


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float,
        max_keep: int | None = None) -> np.ndarray:
    """Greedy NMS -> kept indices (score-descending)."""
    boxes = np.ascontiguousarray(boxes[:, :4], np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(boxes)
    max_keep = n if max_keep is None else max_keep
    lib = _load()
    if lib is None:
        return _nms_np(boxes, scores, thresh, max_keep)
    keep = np.empty((max_keep,), np.int64)
    kept = lib.greedy_nms(_fptr(boxes), _fptr(scores), n,
                          ctypes.c_float(thresh),
                          keep.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_int64)), max_keep)
    return keep[:kept]


def meansub(im: np.ndarray, pixel_means) -> np.ndarray:
    """Fused `im.astype(f32) - pixel_means` (the numpy broadcast over a
    trailing dim of 3 runs ~6x slower than this single pass).  Returns
    None when the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None or im.ndim != 3 or im.shape[2] != 3 \
            or not im.flags['C_CONTIGUOUS']:
        return None
    means = np.ascontiguousarray(
        np.asarray(pixel_means, np.float32).ravel()[:3])
    out = np.empty(im.shape, np.float32)
    npix = im.shape[0] * im.shape[1]
    if im.dtype == np.uint8:
        lib.meansub_u8(im.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)), npix, _fptr(means), _fptr(out))
    elif im.dtype == np.float32:
        lib.meansub_f32(_fptr(im), npix, _fptr(means), _fptr(out))
    else:
        return None
    return out


def pad_s2d(im: np.ndarray, canvas_hw, pad3=None) -> np.ndarray:
    """Fused canvas-pad + conv1-border + 2x2 space-to-depth for ONE
    [h, w, 3] image: -> [(ch+6)/2, (cw+6)/2, 12], layout identical to
    blob.s2d_pack(blob.pad_to_canvas(im, canvas_hw)).  pad3 fills every
    out-of-source position (None = zeros; raw-u8 surfaces pass the
    rounded means).  Returns None when unavailable (caller falls back)."""
    lib = _load()
    ch, cw = int(canvas_hw[0]), int(canvas_hw[1])
    if lib is None or im.ndim != 3 or im.shape[2] != 3 \
            or ch % 2 or cw % 2:
        return None
    h, w = min(im.shape[0], ch), min(im.shape[1], cw)
    im = np.ascontiguousarray(im[:h, :w])
    if im.dtype == np.float32:
        pad = np.zeros(3, np.float32) if pad3 is None \
            else np.ascontiguousarray(pad3, np.float32)
        out = np.empty(((ch + 6) // 2, (cw + 6) // 2, 12), np.float32)
        lib.pad_s2d_f32(_fptr(im), h, w, ch, cw, _fptr(pad), _fptr(out))
    elif im.dtype == np.uint8:
        pad = np.zeros(3, np.uint8) if pad3 is None \
            else np.ascontiguousarray(pad3, np.uint8)
        u8 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        out = np.empty(((ch + 6) // 2, (cw + 6) // 2, 12), np.uint8)
        lib.pad_s2d_u8(u8(im), h, w, ch, cw, u8(pad), u8(out))
    else:
        return None
    return out


# ---------------- numpy fallbacks ----------------

def _bbox_overlaps_np(boxes, query):
    area_b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    area_q = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    lt = np.maximum(boxes[:, None, :2], query[None, :, :2])
    rb = np.minimum(boxes[:, None, 2:], query[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_b[:, None] + area_q[None, :] - inter)


def _nms_np(boxes, scores, thresh, max_keep):
    order = np.argsort(-scores, kind='stable')
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or len(keep) >= max_keep:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt + 1, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        ovr = inter / (areas[i] + areas - inter)
        suppressed |= ovr > thresh
    return np.array(keep, np.int64)
