"""ctypes bindings for the native C++ preprocessing library.

Builds csrc/preprocess.cpp on first use (g++ -O3 -shared) and exposes the
cv2-compatible bilinear resize used by the letterbox path; falls back to the
NumPy implementation if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "preprocess.cpp")
_SO = os.path.join(_REPO_ROOT, "csrc", "libpreprocess.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
             "-pthread", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        stale = (os.path.isfile(_SO) and os.path.isfile(_SRC)
                 and os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if not os.path.isfile(_SO) or stale:
            # (re)build — a stale .so would silently shadow source edits
            if not os.path.isfile(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            f64 = ctypes.c_int64
            fp = ctypes.POINTER(ctypes.c_float)
            lib.resize_bilinear_f32.argtypes = [fp, f64, f64, f64, fp, f64, f64]
            lib.paste_f32.argtypes = [fp, f64, f64, f64, fp, f64, f64, f64, f64]
            lib.fill_f32.argtypes = [fp, f64, f64, f64, fp]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def _fp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear_native(im: np.ndarray, out_h: int, out_w: int):
    """Native resize; returns None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    im = np.ascontiguousarray(im, dtype=np.float32)
    h, w, c = im.shape
    out = np.empty((out_h, out_w, c), np.float32)
    lib.resize_bilinear_f32(_fp(im), h, w, c, _fp(out), out_h, out_w)
    return out


def fill_paste_native(src: np.ndarray, out_h: int, out_w: int,
                      top: int, left: int, color):
    """Allocate an [out_h, out_w, C] canvas filled with `color` and paste
    `src` at (top, left) — the letterbox pad step, threaded-memcpy native.
    Returns None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    h, w, c = src.shape
    out = np.empty((out_h, out_w, c), np.float32)
    col = np.ascontiguousarray(np.broadcast_to(
        np.asarray(color, np.float32), (c,)))
    lib.fill_f32(_fp(out), out_h, out_w, c, _fp(col))
    lib.paste_f32(_fp(src), h, w, c, _fp(out), out_h, out_w, top, left)
    return out
