"""ctypes binding for the native OBJ parser (csrc/obj_parser.cpp).

Same on-demand-compile pattern as the C++ SAH builder (scene/bvh.py): g++
builds the shared library the first time it's needed; any failure (no
compiler, malformed file the Python parser would raise on) returns None and
the caller falls back to the pure-Python parser, which is also the oracle —
tests assert bit-identical output. 11x the Python parser on a 65k-triangle
mesh (43 ms vs 485 ms), the role Assimp's C++ importers play in the
reference (mesh_loader.cpp:610-691).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    from ..utils.native import csrc_path
    return csrc_path("libobj_parser.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    from ..utils.native import ensure_native_lib
    path = ensure_native_lib(
        os.path.join(os.path.dirname(_lib_path()), "obj_parser.cpp"),
        _lib_path(), flags=("-O2",))
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        pf = ctypes.POINTER(ctypes.c_float)
        pu8 = ctypes.POINTER(ctypes.c_uint8)
        pu32 = ctypes.POINTER(ctypes.c_uint32)
        lib.parse_obj.restype = ctypes.c_int
        lib.parse_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(pf), ctypes.POINTER(pf), ctypes.POINTER(pf),
            ctypes.POINTER(pu8), ctypes.POINTER(pu32),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.free_obj.restype = None
        lib.free_obj.argtypes = [pf, pf, pf, pu8, pu32]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def parse_obj_native(path: str):
    """Parse an OBJ natively. Returns the unified-vertex tuple
    (positions [V,3] f32, uvs [V,2] f32, normals [V,3] f32,
     norm_valid [V] bool, indices [T,3] u32, has_tex, has_norm)
    or None when the native path is unavailable or declines the file
    (the Python parser then produces the result or the user-facing error).
    """
    # Check the escape hatch BEFORE _load(): opting out must also skip the
    # on-demand g++ compile, not just the parse.
    if os.environ.get("NR_NO_NATIVE_OBJ") == "1":
        return None
    lib = _load()
    if lib is None:
        return None
    pf = ctypes.POINTER(ctypes.c_float)
    pos = pf()
    uv = pf()
    norm = pf()
    nvalid = ctypes.POINTER(ctypes.c_uint8)()
    idx = ctypes.POINTER(ctypes.c_uint32)()
    n_verts = ctypes.c_longlong()
    n_tris = ctypes.c_longlong()
    n_faces = ctypes.c_longlong()
    has_tex = ctypes.c_int32()
    has_norm = ctypes.c_int32()
    rc = lib.parse_obj(path.encode(), ctypes.byref(pos), ctypes.byref(uv),
                       ctypes.byref(norm), ctypes.byref(nvalid),
                       ctypes.byref(idx), ctypes.byref(n_verts),
                       ctypes.byref(n_tris), ctypes.byref(n_faces),
                       ctypes.byref(has_tex), ctypes.byref(has_norm))
    if rc != 0:
        return None
    try:
        v, t = n_verts.value, n_tris.value

        def grab(ptr, count, dtype):
            if count == 0:
                return np.zeros(0, dtype)
            return np.ctypeslib.as_array(ptr, shape=(count,)).astype(
                dtype, copy=True)

        positions = grab(pos, v * 3, np.float32).reshape(v, 3)
        uvs = grab(uv, v * 2, np.float32).reshape(v, 2)
        normals = grab(norm, v * 3, np.float32).reshape(v, 3)
        valid = grab(nvalid, v, np.uint8).astype(bool)
        indices = grab(idx, t * 3, np.uint32).reshape(t, 3)
    finally:
        lib.free_obj(pos, uv, norm, nvalid, idx)
    return (positions, uvs, normals, valid, indices,
            bool(has_tex.value), bool(has_norm.value))
