"""Native host runtime bindings (ctypes over libgravit_host.so).

Compiled on demand with g++ -O3 and cached next to the source; every entry
point has a pure-python fallback, so the framework works without a
toolchain (the .so just makes host-side scene ingestion + BVH builds fast,
mirroring the reference's all-C++ host path).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "gravit_host.cpp"
_SO = _DIR / "libgravit_host.so"
_lib: "Optional[ctypes.CDLL]" = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-o", str(_SO),
                 str(_SRC)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SO))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.gravit_build_bvh.restype = ctypes.c_int
        lib.gravit_build_bvh.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
            f32p, i32p, i32p, ctypes.POINTER(ctypes.c_int32)]
        lib.gravit_parse_obj.restype = ctypes.c_int
        lib.gravit_parse_obj.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                     max_leaf: int = 8):
    """Native binned-SAH build; returns (bounds, meta, order, depth) or
    None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = v0.shape[0]
    cap = max(2 * t + 8, 16)
    bounds = np.zeros((cap, 8), np.float32)
    meta = np.zeros((cap, 4), np.int32)
    order = np.zeros((t,), np.int32)
    depth = ctypes.c_int32(0)
    n = lib.gravit_build_bvh(
        np.ascontiguousarray(v0, np.float32),
        np.ascontiguousarray(e1, np.float32),
        np.ascontiguousarray(e2, np.float32),
        t, max_leaf, bounds.reshape(-1), meta.reshape(-1), order,
        ctypes.byref(depth))
    if n <= 0:
        return None
    return bounds[:n].copy(), meta[:n].copy(), order, int(depth.value)


def parse_obj_native(path: str):
    """Native OBJ vertex/face scan; returns (verts (V,3), faces (F,3)) or
    None. (Normals/materials still parsed in python — they're cold.)"""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int32(0)
    nf = ctypes.c_int32(0)
    rc = lib.gravit_parse_obj(path.encode(), None, None,
                              ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0 or nv.value <= 0:
        return None
    verts = np.zeros((nv.value, 3), np.float32)
    faces = np.zeros((max(nf.value, 1), 3), np.int32)
    rc = lib.gravit_parse_obj(
        path.encode(), verts.ctypes.data_as(ctypes.c_void_p),
        faces.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        return None
    return verts, faces[: nf.value]
