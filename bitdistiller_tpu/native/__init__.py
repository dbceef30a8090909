"""Native (C++) runtime helpers, loaded via ctypes with a compile-on-demand
build and a transparent JAX fallback when no toolchain is available.

Exposes `quantize_pack_native(w, bits, group_size)` — the multithreaded host
packer used for checkpoint conversion of large models (pack_model's hot path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packlib.cpp")
_SO = os.path.join(_HERE, "libpack.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no toolchain / build failure -> fallback
        print(f"[bitdistiller_tpu.native] build failed ({e}); using JAX fallback",
              file=sys.stderr)
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.quantize_pack.restype = ctypes.c_int
        lib.quantize_pack.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.unpack.restype = ctypes.c_int
        lib.unpack.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def quantize_pack_native(w: np.ndarray, bits: int, group_size: int = 128,
                         n_threads: int = 0):
    """w: [K, N] float32 -> (qweight int32 [K/pack, N], scales, szeros [K/G, N]).

    Raises RuntimeError if the native library is unavailable — callers should
    check native_available() or use quant.packing.quantize_pack_linear.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native packlib unavailable")
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    g = group_size if group_size > 0 else k
    pack = 32 // bits
    qweight = np.empty((k // pack, n), np.int32)
    scales = np.empty((k // g, n), np.float32)
    szeros = np.empty((k // g, n), np.float32)
    rc = lib.quantize_pack(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), k, n, bits, g,
        qweight.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        szeros.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"quantize_pack failed with code {rc}")
    return qweight, scales, szeros


def unpack_native(qweight: np.ndarray, k: int, bits: int, group_size: int):
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native packlib unavailable")
    qweight = np.ascontiguousarray(qweight, np.int32)
    n = qweight.shape[1]
    out = np.empty((k, n), np.int32)
    rc = lib.unpack(
        qweight.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), k, n, bits,
        group_size if group_size > 0 else k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"unpack failed with code {rc}")
    return out
