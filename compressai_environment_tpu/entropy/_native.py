"""ctypes bridge to the C++ host rANS coder (``csrc/rans.cpp``).

The shared library is compiled on first use with the system ``g++`` and cached
next to the source; set ``COMPRESSAI_TPU_NO_NATIVE=1`` to force the pure-Python
spec coder instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["load_native", "native_available"]

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_SRC = _CSRC / "rans.cpp"
_BUILD_DIR = _CSRC / "_build"

_lock = threading.Lock()
_lib = None
_load_failed = False

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")


def _debug_build() -> bool:
    """COMPRESSAI_TPU_DEBUG_BUILD=1 compiles the coder with -O0 -g and CDF
    validation (the reference's DEBUG_BUILD=1 analogue, setup.py:72-73):
    entry points reject malformed CDF tables with an error instead of
    emitting corrupt streams."""
    return os.environ.get("COMPRESSAI_TPU_DEBUG_BUILD") == "1"


def _build() -> Path:
    _BUILD_DIR.mkdir(exist_ok=True)
    debug = _debug_build()
    so = _BUILD_DIR / ("librans_debug.so" if debug else "librans.so")
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    tmp = _BUILD_DIR / f"librans.{os.getpid()}.tmp.so"
    flags = (
        ["-O0", "-g", "-DRANS_VALIDATE"] if debug else ["-O3", "-march=native"]
    )
    cmd = [
        "g++", *flags, "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # -march=native or -fopenmp may be unsupported; retry conservatively.
        cmd = ["g++", *[f for f in flags if f != "-march=native"],
               "-std=c++17", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)]
        subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)
    return so


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.c_int64
    vp = ctypes.c_void_p
    lib.rans_encode.restype = i64
    lib.rans_encode.argtypes = [_i32p, _i32p, i64, _i32p, i64, _i32p, _i32p, _u8p, i64]
    lib.rans_decode.restype = i64
    lib.rans_decode.argtypes = [_u8p, _i32p, i64, _i32p, i64, _i32p, _i32p, _i32p]
    lib.rans_encode_batch.restype = i64
    lib.rans_encode_batch.argtypes = [
        _i32p, _i32p, i64, i64, _i32p, i64, _i32p, _i32p, _u8p, i64, _i64p,
    ]
    lib.rans_decode_batch.restype = i64
    lib.rans_decode_batch.argtypes = [
        _u8p, _i64p, _i32p, i64, i64, _i32p, i64, _i32p, _i32p, _i32p,
    ]
    lib.rans_dec_new.restype = vp
    lib.rans_dec_new.argtypes = [_u8p, i64]
    lib.rans_dec_free.restype = None
    lib.rans_dec_free.argtypes = [vp]
    lib.rans_dec_decode.restype = None
    lib.rans_dec_decode.argtypes = [vp, _i32p, i64, _i32p, i64, _i32p, _i32p, _i32p]
    lib.rans_enc_new.restype = vp
    lib.rans_enc_new.argtypes = []
    lib.rans_enc_free.restype = None
    lib.rans_enc_free.argtypes = [vp]
    lib.rans_enc_put.restype = None
    lib.rans_enc_put.argtypes = [vp, _i32p, _i32p, i64, _i32p, i64, _i32p, _i32p]
    lib.rans_enc_flush.restype = i64
    lib.rans_enc_flush.argtypes = [vp, _u8p, i64]
    return lib


def load_native():
    """Return the bound CDLL, or None if unavailable/disabled."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("COMPRESSAI_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            so = _build()
            _lib = _bind(ctypes.CDLL(str(so)))
        except Exception:
            _load_failed = True
            return None
    return _lib


def native_available() -> bool:
    return load_native() is not None
