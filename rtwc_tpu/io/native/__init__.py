"""ctypes loader for the native C++ ANSI encoder (ansi_encoder.cpp).

The runtime around the TPU compute path stays native where the reference's
is (PrintMachine/Minimize* are C++ host code, RayTracingManager.cu:167-319,
PrintMachine.cpp): the per-frame byte-formatting pass is the host hot loop
at large resolutions, so it is compiled C++, built on demand with g++ into
a cached shared object. Python falls back to encode.py's NumPy encoder when
no compiler is available (encode.encode_frame handles that).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "ansi_encoder.cpp")
_LIB_NAME = "librtwc_ansi.so"
_lib = None


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    so = os.path.join(_build_dir(), _LIB_NAME)
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(_SRC)):
        # Atomic build: compile to a temp name, rename into place, so
        # concurrent processes never dlopen a half-written object.
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_build_dir())
        os.close(fd)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, _SRC],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    _lib = ctypes.CDLL(so)
    _lib.rtwc_encode_frame.restype = ctypes.c_int64
    _lib.rtwc_encode_frame.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    return _lib


def encode_frame_native(kind: np.ndarray, color: np.ndarray, char: np.ndarray) -> bytes:
    """C++ encode; same byte contract as encode.encode_frame_numpy."""
    lib = _load()
    H, W = kind.shape
    truecolor = 1 if color.ndim == 3 else 0
    kind32 = np.ascontiguousarray(kind, np.int32)
    color32 = np.ascontiguousarray(color, np.int32)
    char32 = np.ascontiguousarray(char, np.int32)
    out = np.empty(H * W * 20 + H, np.uint8)
    n = lib.rtwc_encode_frame(
        kind32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        color32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        char32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        H, W, truecolor,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out[:n].tobytes()
