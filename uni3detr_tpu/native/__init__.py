"""Native (C++) host data ops: build + ctypes bindings.

The reference keeps these loops out of Python too (numba njit/CUDA in
mmdet3d box_np_ops; dbsampler.py:246-258).  Here they are a single C++
translation unit compiled on first use with g++ (pybind11 is not in
this image, so entry points are extern "C" + ctypes).

- The shared object is cached next to the source as ``_data_ops_<hash>.so``
  where <hash> covers the source text, so edits rebuild automatically.
- ``UNI3DETR_NATIVE=0`` disables the native path (numpy fallbacks in
  data/box_np_ops.py take over).
- If g++ is missing or compilation fails, ``load()`` returns None and
  callers silently fall back to numpy.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "data_ops.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
           "-march=native", "-o", out, src]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        print(f"[uni3detr_tpu.native] build failed:\n{r.stderr}",
              file=sys.stderr)
        return False
    return True


def load():
    """Return the ctypes library, building it if needed, or None."""
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED or os.environ.get("UNI3DETR_NATIVE", "1") == "0":
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            with open(_SRC, "rb") as f:
                src_bytes = f.read()
        except OSError:
            return None
        tag = hashlib.sha256(src_bytes).hexdigest()[:12]
        so = os.path.join(_DIR, f"_data_ops_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            if not _build(_SRC, tmp):
                return None
            os.replace(tmp, so)  # atomic vs concurrent workers
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.points_in_rbbox.argtypes = [
            _f32p, _i64, _i64, _f32p, _i64, _i64, ctypes.c_int, _u8p]
        lib.points_in_any_rbbox.argtypes = [
            _f32p, _i64, _i64, _f32p, _i64, _i64, ctypes.c_int, _u8p]
        lib.box_collision_test.argtypes = [
            _f32p, _i64, _i64, _f32p, _i64, _i64, _u8p]
        lib.object_noise.argtypes = [
            _f32p, _i64, _i64, _f32p, _i64, _i64,
            _f32p, _f32p, _i64, _i32p]
        for fn in (lib.points_in_rbbox, lib.points_in_any_rbbox,
                   lib.box_collision_test, lib.object_noise):
            fn.restype = None
        _LIB = lib
        return _LIB


def _c32(a):
    return np.ascontiguousarray(a, np.float32)


def points_in_rbbox(points, boxes, z_origin="bottom"):
    """Native (P, N) membership mask; None if the lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    pts = _c32(points)
    bxs = _c32(boxes)
    out = np.empty((len(pts), len(bxs)), np.uint8)
    if len(pts) and len(bxs):
        lib.points_in_rbbox(pts, pts.shape[0], pts.shape[1],
                            bxs, bxs.shape[0], bxs.shape[1],
                            0 if z_origin == "bottom" else 1, out)
    return out.astype(bool)


def points_in_any_rbbox(points, boxes, z_origin="bottom"):
    """Native fused (P,) any-box mask; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    pts = _c32(points)
    bxs = _c32(boxes)
    out = np.zeros(len(pts), np.uint8)
    if len(pts) and len(bxs):
        lib.points_in_any_rbbox(pts, pts.shape[0], pts.shape[1],
                                bxs, bxs.shape[0], bxs.shape[1],
                                0 if z_origin == "bottom" else 1, out)
    return out.astype(bool)


def box_collision_test(boxes_a, boxes_b):
    """Native (Na, Nb) BEV SAT overlap matrix; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    a = _c32(boxes_a)
    b = _c32(boxes_b)
    out = np.empty((len(a), len(b)), np.uint8)
    if len(a) and len(b):
        lib.box_collision_test(a, a.shape[0], a.shape[1],
                               b, b.shape[0], b.shape[1], out)
    return out.astype(bool)


def object_noise(points, boxes, trans, rots):
    """Run the full ObjectNoise rejection loop natively, in place.

    points (P, pdim) float32 and boxes (G, bdim) float32 are modified
    in place; trans (G, T, 3) / rots (G, T) are the pre-drawn trials.
    Returns the (G,) accepted-trial indices (-1 = box left unchanged),
    or None if the native lib is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    assert points.dtype == np.float32 and points.flags.c_contiguous
    assert boxes.dtype == np.float32 and boxes.flags.c_contiguous
    t = _c32(trans)
    r = _c32(rots)
    G = len(boxes)
    acc = np.full(G, -1, np.int32)
    if G and len(points):
        lib.object_noise(points, points.shape[0], points.shape[1],
                         boxes, G, boxes.shape[1],
                         t, r, r.shape[1], acc)
    return acc
