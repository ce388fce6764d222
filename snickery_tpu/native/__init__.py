"""ctypes bindings for the native (C++) runtime pieces.

Builds ``native/libsnickery_native.so`` on demand with make/g++ (pybind11 is
not available in this environment; the C ABI + ctypes keeps the binding
dependency-free).  Every entry point degrades gracefully: if the toolchain
or library is unavailable, callers fall back to the pure-python/numpy
implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from snickery_tpu import utils

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsnickery_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _build() -> bool:
    try:
        res = subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            utils.logger.warning("native build failed: %s", res.stderr[-500:])
            return False
        return True
    except Exception as e:  # noqa: BLE001
        utils.logger.warning("native build unavailable: %s", e)
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            utils.logger.warning("cannot load native lib: %s", e)
            _lib_failed = True
            return None
        lib.snickery_detect_epochs.restype = ctypes.c_int
        lib.snickery_detect_epochs.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.snickery_read_stream.restype = ctypes.c_int64
        lib.snickery_read_stream.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.snickery_write_stream.restype = ctypes.c_int64
        lib.snickery_write_stream.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _lib = lib
        return _lib


def native_detect_epochs(
    wave: np.ndarray, sr: int, fmin: float = 50.0, fmax: float = 400.0,
    unvoiced_period_sec: float = 0.005,
) -> np.ndarray | None:
    """Run the C++ epoch detector; None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    wave32 = np.ascontiguousarray(wave, dtype=np.float32)
    max_marks = max(64, int(len(wave32) / max(sr * unvoiced_period_sec, 1) * 4))
    out = np.zeros(max_marks, dtype=np.int32)
    n = lib.snickery_detect_epochs(
        wave32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wave32),
        int(sr), float(fmin), float(fmax), float(unvoiced_period_sec),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_marks)
    if n < 0:
        return None
    return np.unique(out[:n])


def native_read_stream(path: str, dim: int) -> np.ndarray | None:
    """Read a float32 stream file via the native reader; None if unavailable."""
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    n_bytes = os.path.getsize(path)
    n_floats = n_bytes // 4
    out = np.empty(n_floats, dtype=np.float32)
    got = lib.snickery_read_stream(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_floats)
    if got != n_floats or (dim > 0 and got % dim != 0):
        return None
    return out.reshape(-1, dim) if dim > 0 else out
