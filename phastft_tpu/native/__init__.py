"""ctypes loader for the native host runtime, with pure-numpy fallback.

Builds phastft_host.cpp with the system C++ toolchain on first use and
caches the shared object next to the source. Everything here degrades
gracefully: if no compiler is available the Python/numpy fallbacks in the
callers are used instead (set PHASTFT_TPU_NO_NATIVE=1 to force that).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "phastft_host.cpp")
_SO = os.path.join(_HERE, "phastft_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PHASTFT_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.bit_reverse_indices32.argtypes = [ctypes.c_int32, i32p]
        lib.twiddles_f64.argtypes = [i64, i64, ctypes.c_double, f64p, f64p]
        lib.twiddles_f32.argtypes = [i64, i64, ctypes.c_double, f32p, f32p]
        lib.correction_table_f64.argtypes = [i64, i64, f64p, f64p]
        lib.correction_table_f32.argtypes = [i64, i64, f32p, f32p]
        lib.deinterleave_f64.argtypes = [f64p, i64, f64p, f64p]
        lib.interleave_f64.argtypes = [f64p, f64p, i64, f64p]
        lib.deinterleave_f32.argtypes = [f32p, i64, f32p, f32p]
        lib.interleave_f32.argtypes = [f32p, f32p, i64, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def bit_reverse_indices(n: int):
    """Native bit-reversal table or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.int32)
    lib.bit_reverse_indices32(n.bit_length() - 1, out)
    return out


def twiddles(m: int, count: int, scale: float, dtype):
    """Native (cos, sin) of -2*pi*k/m, k < count, times scale; or None."""
    lib = _load()
    if lib is None:
        return None
    dt = np.dtype(dtype)
    cre = np.empty(count, dt)
    cim = np.empty(count, dt)
    if dt == np.float64:
        lib.twiddles_f64(m, count, scale, cre, cim)
    else:
        lib.twiddles_f32(m, count, scale, cre, cim)
    return cre, cim


def correction_table(rows: int, cols: int, dtype):
    """Native W_(rows*cols)^(r*c) table, or None."""
    lib = _load()
    if lib is None:
        return None
    dt = np.dtype(dtype)
    cre = np.empty((rows, cols), dt)
    cim = np.empty((rows, cols), dt)
    if dt == np.float64:
        lib.correction_table_f64(rows, cols, cre, cim)
    else:
        lib.correction_table_f32(rows, cols, cre, cim)
    return cre, cim


def deinterleave(x: np.ndarray):
    """Native flat-pair deinterleave, or None."""
    lib = _load()
    if lib is None or x.ndim != 1 or not x.flags["C_CONTIGUOUS"]:
        return None
    pairs = x.shape[0] // 2
    dt = x.dtype
    if dt not in (np.float64, np.float32):
        return None
    re = np.empty(pairs, dt)
    im = np.empty(pairs, dt)
    if dt == np.float64:
        lib.deinterleave_f64(x[: 2 * pairs], pairs, re, im)
    else:
        lib.deinterleave_f32(x[: 2 * pairs], pairs, re, im)
    return re, im


def interleave(re: np.ndarray, im: np.ndarray):
    """Native planar->interleaved, or None."""
    lib = _load()
    if (
        lib is None
        or re.ndim != 1
        or re.dtype not in (np.float64, np.float32)
        or not (re.flags["C_CONTIGUOUS"] and im.flags["C_CONTIGUOUS"])
    ):
        return None
    pairs = re.shape[0]
    x = np.empty(2 * pairs, re.dtype)
    if re.dtype == np.float64:
        lib.interleave_f64(re, im, pairs, x)
    else:
        lib.interleave_f32(re, im, pairs, x)
    return x
