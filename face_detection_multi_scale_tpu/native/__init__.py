"""ctypes bindings for the native C++ postprocess kernels
(native/postprocess.cpp): pairwise +1-convention IoU, greedy NMS, grid
decode, letterbox inverse. Built on demand with g++ and cached next to the
source; every entry point has a pure-numpy fallback, so the framework
works without a compiler."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "postprocess.cpp")
SO = os.path.join(os.path.dirname(SRC), "libfdms.so")


def _build() -> bool:
    try:
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC,
               "-o", SO]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(SO) or (
            os.path.exists(SRC)
            and os.path.getmtime(SRC) > os.path.getmtime(SO)):
        if not (os.path.exists(SRC) and _build()):
            return None
    try:
        lib = ctypes.CDLL(SO)
    except OSError:
        return None
    lib.bbox_overlaps_plus1.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]
    lib.greedy_nms.restype = ctypes.c_int64
    lib.greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    lib.decode_level.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ctypes.POINTER(ctypes.c_float)]
    lib.scale_coords_inverse.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def bbox_overlaps_plus1(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Native +1-convention IoU; falls back to the numpy implementation."""
    lib = load()
    if lib is None:
        from face_detection_multi_scale_tpu.eval.widerface import (
            bbox_overlaps_plus1 as np_impl)
        return np_impl(boxes, query)
    b = np.ascontiguousarray(boxes, np.float64)
    q = np.ascontiguousarray(query, np.float64)
    out = np.empty((len(b), len(q)), np.float64)
    lib.bbox_overlaps_plus1(_ptr(b, ctypes.c_double), len(b),
                            _ptr(q, ctypes.c_double), len(q),
                            _ptr(out, ctypes.c_double))
    return out


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float,
               max_det: Optional[int] = None) -> np.ndarray:
    """Native greedy NMS returning kept indices (descending score)."""
    lib = load()
    n = len(boxes)
    max_det = max_det or n
    if lib is None:
        raise RuntimeError("native library unavailable")
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(max_det, np.int32)
    kept = lib.greedy_nms(_ptr(b, ctypes.c_float), _ptr(s, ctypes.c_float),
                          n, iou_thres, max_det,
                          _ptr(keep, ctypes.c_int32))
    return keep[:kept].copy()


def decode_level(raw: np.ndarray, anchors: np.ndarray, stride: float,
                 nc: int, nkpt: int) -> np.ndarray:
    """Native decode of one (na, ny, nx, no) raw map -> (na*ny*nx, no)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    na, ny, nx, no = raw.shape
    r = np.ascontiguousarray(raw, np.float32)
    a = np.ascontiguousarray(anchors, np.float32)
    out = np.empty((na * ny * nx, no), np.float32)
    lib.decode_level(_ptr(r, ctypes.c_float), na, ny, nx, no, nc, nkpt,
                     _ptr(a, ctypes.c_float), stride,
                     _ptr(out, ctypes.c_float))
    return out


APP = os.path.join(os.path.dirname(SRC), "fdms_detect")


def build_app() -> Optional[str]:
    """Build the standalone native detector (native/fdms_detect.cpp)."""
    app_src = os.path.join(os.path.dirname(SRC), "fdms_detect.cpp")
    if os.path.exists(APP) and os.path.getmtime(APP) > max(
            os.path.getmtime(app_src), os.path.getmtime(SRC)):
        return APP
    try:
        subprocess.run(["g++", "-O3", "-std=c++17", app_src, SRC,
                        "-o", APP], check=True, capture_output=True,
                       timeout=180)
        return APP
    except Exception:
        return None


def dump_raw_heads(path: str, raws, spec) -> str:
    """Write per-level raw head maps in the fdms_detect binary format:
    header (n_levels, nc, nkpt int64) then per level (na, ny, nx, no
    int64; stride f32; anchors f32; raw map f32)."""
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack("<3q", len(raws), spec.nc, spec.nkpt))
        for lvl, raw in enumerate(raws):
            raw = np.asarray(raw, np.float32)
            if raw.ndim == 5:  # (1, na, ny, nx, no)
                raw = raw[0]
            na, ny, nx, no = raw.shape
            f.write(struct.pack("<4q", na, ny, nx, no))
            f.write(struct.pack("<f", float(spec.strides[lvl])))
            anchors = np.asarray(spec.anchors[lvl],
                                 np.float32).reshape(-1, 2)
            f.write(anchors.tobytes())
            f.write(np.ascontiguousarray(raw).tobytes())
    return path


def run_native_detector(raw_path: str, conf_thres: float = 0.25,
                        iou_thres: float = 0.45,
                        max_det: int = 300) -> np.ndarray:
    """Run the native app on a raw-heads dump; returns (n, 5) rows
    [x1, y1, x2, y2, conf] in input-frame pixels."""
    app = build_app()
    if app is None:
        raise RuntimeError("native detector app could not be built")
    out = subprocess.run(
        [app, raw_path, str(conf_thres), str(iou_thres), str(max_det)],
        check=True, capture_output=True, text=True, timeout=120)
    rows = [[float(v) for v in line.split()]
            for line in out.stdout.strip().splitlines() if line]
    return np.array(rows, np.float64).reshape(-1, 5)


def scale_coords_inverse(coords: np.ndarray, in_shape, out_shape
                         ) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    c = np.ascontiguousarray(coords, np.float64)
    lib.scale_coords_inverse(_ptr(c, ctypes.c_double), len(c),
                             float(in_shape[0]), float(in_shape[1]),
                             float(out_shape[0]), float(out_shape[1]))
    return c
