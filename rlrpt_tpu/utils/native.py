"""ctypes bindings for the native IO runtime (csrc/librlrpt_io.so).

The reference's data layer is C++ (OBJ importer object_importer.cu, Q-table
text IO radiance_map.cu:237-268, BMP dump sdl_screen.cpp:60-66); this is
the TPU build's native equivalent.  Falls back to the pure-Python
implementations transparently when the library has not been built
(`make -C csrc`); `have_native()` reports which path is live.  Builds are
attempted once automatically if a toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "librlrpt_io.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.path.exists(
            os.path.join(_CSRC, "Makefile")):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.rlrpt_obj_load.restype = ctypes.c_void_p
    lib.rlrpt_obj_load.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.rlrpt_obj_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p]
    lib.rlrpt_obj_free.argtypes = [ctypes.c_void_p]
    lib.rlrpt_save_q_table.restype = ctypes.c_int
    lib.rlrpt_save_q_table.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64]
    lib.rlrpt_load_q_table.restype = ctypes.c_int64
    lib.rlrpt_load_q_table.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_int64)]
    lib.rlrpt_write_bmp.restype = ctypes.c_int
    lib.rlrpt_write_bmp.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def parse_obj_native(path: str, normalise: bool = True):
    """Native OBJ parse + reference normalisation.

    Returns (verts (V, 3) float32, faces (F, 3) int64 1-based) or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    h = lib.rlrpt_obj_load(path.encode(), int(normalise),
                           ctypes.byref(nv), ctypes.byref(nt))
    if not h:
        raise FileNotFoundError(path)
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nt.value, 3), np.int64)
    lib.rlrpt_obj_copy(h, verts.ctypes.data_as(ctypes.c_void_p),
                       faces.ctypes.data_as(ctypes.c_void_p))
    lib.rlrpt_obj_free(h)
    return verts, faces


def save_q_table_native(path: str, pos: np.ndarray, q: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    pos = np.ascontiguousarray(pos, np.float32)
    q = np.ascontiguousarray(q, np.float32)
    rc = lib.rlrpt_save_q_table(path.encode(),
                                pos.ctypes.data_as(ctypes.c_void_p),
                                q.ctypes.data_as(ctypes.c_void_p),
                                pos.shape[0], q.shape[1])
    return rc == 0


def load_q_table_native(path: str):
    """Returns (pos (V,3), q (V,S)) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    ns = ctypes.c_int64()
    count = lib.rlrpt_load_q_table(path.encode(), None, None,
                                   ctypes.byref(ns))
    if count < 0:
        raise FileNotFoundError(path)
    pos = np.empty((count, 3), np.float32)
    q = np.empty((count, ns.value), np.float32)
    lib.rlrpt_load_q_table(path.encode(),
                           pos.ctypes.data_as(ctypes.c_void_p),
                           q.ctypes.data_as(ctypes.c_void_p),
                           ctypes.byref(ns))
    return pos, q


def write_bmp_native(path: str, img_u8: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, _ = img_u8.shape
    rc = lib.rlrpt_write_bmp(path.encode(),
                             img_u8.ctypes.data_as(ctypes.c_void_p), w, h)
    return rc == 0
