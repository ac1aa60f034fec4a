"""ctypes bindings to the native C++ asset loader.

The reference's asset path is native code (the obj-rs and image Rust crates,
Cargo.toml:8-10); our equivalent is a small C++ shared library
(native/asset_loader.cpp) that decodes TGA (incl. RLE) and parses OBJ at
native speed.  The NumPy implementations in tga.py/obj.py remain the
reference semantics and the fallback; tests assert both backends produce
identical bytes.

The library is built lazily with `make -C native` on first use (g++ only, no
external deps).  If the toolchain or build is unavailable, all entry points
return None and callers fall back to NumPy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libasset_loader.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _get_lib():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.trt_decode_tga.restype = ctypes.c_int
            lib.trt_decode_tga.argtypes = [
                ctypes.c_char_p,          # path
                ctypes.POINTER(ctypes.c_int32),  # out: height
                ctypes.POINTER(ctypes.c_int32),  # out: width
                ctypes.POINTER(ctypes.c_void_p),  # out: rgb buffer (malloc'd)
            ]
            lib.trt_free.restype = None
            lib.trt_free.argtypes = [ctypes.c_void_p]
            i32p = ctypes.POINTER(ctypes.c_int32)
            vpp = ctypes.POINTER(ctypes.c_void_p)
            lib.trt_parse_obj.restype = ctypes.c_int
            lib.trt_parse_obj.argtypes = [
                ctypes.c_char_p,
                i32p, vpp,  # positions
                i32p, vpp,  # tex_coords
                i32p, vpp,  # normals
                i32p, vpp, vpp, vpp,  # faces: pos/tex/norm index arrays
            ]
            _lib = lib
        except Exception:
            _load_failed = True
            _lib = None
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _take_array(lib, ptr, count, ctype, np_dtype):
    arr = np.ctypeslib.as_array(ctypes.cast(ptr, ctypes.POINTER(ctype)), shape=(count,))
    out = arr.copy().astype(np_dtype, copy=False)
    lib.trt_free(ptr)
    return out


def read_obj_native(path: str):
    """Parse an OBJ file via the native library; returns an ObjMesh or None."""
    lib = _get_lib()
    if lib is None or not hasattr(lib, "trt_parse_obj"):
        return None
    nv = ctypes.c_int32()
    nvt = ctypes.c_int32()
    nvn = ctypes.c_int32()
    nf = ctypes.c_int32()
    bufs = [ctypes.c_void_p() for _ in range(6)]
    rc = lib.trt_parse_obj(
        path.encode(),
        ctypes.byref(nv), ctypes.byref(bufs[0]),
        ctypes.byref(nvt), ctypes.byref(bufs[1]),
        ctypes.byref(nvn), ctypes.byref(bufs[2]),
        ctypes.byref(nf), ctypes.byref(bufs[3]),
        ctypes.byref(bufs[4]), ctypes.byref(bufs[5]),
    )
    if rc != 0:
        for b in bufs:
            if b.value:
                lib.trt_free(b)
        return None
    from .obj import ObjMesh

    V, VT, VN, T = int(nv.value), int(nvt.value), int(nvn.value), int(nf.value)
    return ObjMesh(
        positions=_take_array(lib, bufs[0], V * 3, ctypes.c_float, np.float32).reshape(V, 3),
        tex_coords=_take_array(lib, bufs[1], VT * 2, ctypes.c_float, np.float32).reshape(VT, 2),
        normals=_take_array(lib, bufs[2], VN * 3, ctypes.c_float, np.float32).reshape(VN, 3),
        pos_idx=_take_array(lib, bufs[3], T * 3, ctypes.c_int32, np.int32).reshape(T, 3),
        tex_idx=_take_array(lib, bufs[4], T * 3, ctypes.c_int32, np.int32).reshape(T, 3),
        normal_idx=_take_array(lib, bufs[5], T * 3, ctypes.c_int32, np.int32).reshape(T, 3),
    )


def read_tga_native(path: str) -> np.ndarray | None:
    """Decode a TGA file via the native library; None if unavailable/failed."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    buf = ctypes.c_void_p()
    rc = lib.trt_decode_tga(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(buf))
    if rc != 0 or not buf.value:
        return None
    try:
        n = int(h.value) * int(w.value) * 3
        arr = np.ctypeslib.as_array(ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)), shape=(n,))
        out = arr.copy().reshape(int(h.value), int(w.value), 3)
    finally:
        lib.trt_free(buf)
    return out
