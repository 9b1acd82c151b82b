"""ctypes bindings for the native C++ runtime components (native/).

Auto-builds libhrt_native.so on first use when a toolchain is present;
every caller has a pure-Python fallback, so the framework works without
the native library (it is a speed path, like the reference's vendored
C++ tinyobj, ref: libs/tinyobj/tiny_obj_loader.h).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhrt_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _ObjMesh(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("n_vertices", ctypes.c_int),
        ("indices", ctypes.POINTER(ctypes.c_int)),
        ("n_tris", ctypes.c_int),
    ]


def lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        cdll = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    cdll.obj_load.restype = ctypes.c_int
    cdll.obj_load.argtypes = [ctypes.c_char_p, ctypes.POINTER(_ObjMesh)]
    cdll.obj_free.argtypes = [ctypes.POINTER(_ObjMesh)]
    cdll.sah_build.restype = ctypes.c_int
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    cdll.sah_build.argtypes = [
        f32p, f32p, f32p, i32p, ctypes.c_int, ctypes.c_int,
        i32p, i32p, f32p, f32p, f32p, f32p,
        i32p, f32p, f32p, ctypes.POINTER(ctypes.c_int),
    ]
    _lib = cdll
    return _lib


def load_obj(path: str):
    """Native OBJ load -> (vertices (V,8) f32, indices (T,3) i32) or
    None when the library is unavailable."""
    cdll = lib()
    if cdll is None:
        return None
    mesh = _ObjMesh()
    rc = cdll.obj_load(path.encode(), ctypes.byref(mesh))
    if rc != 0:
        raise FileNotFoundError(f"obj_load('{path}') failed rc={rc}")
    try:
        verts = np.ctypeslib.as_array(
            mesh.vertices, (mesh.n_vertices, 8)).copy()
        idx = np.ctypeslib.as_array(mesh.indices, (mesh.n_tris, 3)).copy()
    finally:
        cdll.obj_free(ctypes.byref(mesh))
    return verts, idx


def sah_build(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
              valid: np.ndarray, leaf_size: int):
    """Native binned-SAH build.  Returns a dict of numpy arrays
    (child_l/r, child boxes, leaf_tri (n_leaf, K), leaf boxes) or None."""
    cdll = lib()
    if cdll is None:
        return None
    t = v0.shape[0]
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    valid = np.ascontiguousarray(valid, np.int32)
    child_l = np.zeros(t, np.int32)
    child_r = np.zeros(t, np.int32)
    bl_min = np.zeros((t, 3), np.float32)
    bl_max = np.zeros((t, 3), np.float32)
    br_min = np.zeros((t, 3), np.float32)
    br_max = np.zeros((t, 3), np.float32)
    leaf_tri = np.zeros(2 * t + leaf_size, np.int32)
    leaf_min = np.zeros((t + 1, 3), np.float32)
    leaf_max = np.zeros((t + 1, 3), np.float32)
    n_leaf = ctypes.c_int(0)
    ni = cdll.sah_build(v0, e1, e2, valid, t, leaf_size, child_l, child_r,
                        bl_min.reshape(-1), bl_max.reshape(-1),
                        br_min.reshape(-1), br_max.reshape(-1),
                        leaf_tri, leaf_min.reshape(-1),
                        leaf_max.reshape(-1), ctypes.byref(n_leaf))
    nl = n_leaf.value
    if nl == 0:
        return None
    return {
        "child_l": child_l[:ni].copy(),
        "child_r": child_r[:ni].copy(),
        "bmin_l": bl_min[:ni].copy(), "bmax_l": bl_max[:ni].copy(),
        "bmin_r": br_min[:ni].copy(), "bmax_r": br_max[:ni].copy(),
        "leaf_tri": leaf_tri[: nl * leaf_size].reshape(nl, leaf_size)
        .copy(),
        "leaf_min": leaf_min[:nl].copy(),
        "leaf_max": leaf_max[:nl].copy(),
    }
