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


def _find_lib() -> str | None:
    """Locate the native library across deployment shapes.

    Order: SNICKERY_NATIVE_LIB env override -> the wheel-installed
    extension next to this package (built by setup.py as
    ``_libsnickery_native*.so``; plain C ABI, loaded via ctypes) -> the
    repo-checkout ``native/`` directory (where ``make`` drops it).
    """
    import glob
    override = os.environ.get("SNICKERY_NATIVE_LIB")
    if override and os.path.exists(override):
        return override
    here = os.path.dirname(os.path.abspath(__file__))
    packaged = sorted(glob.glob(os.path.join(here, "_libsnickery_native*.so")))
    if packaged:
        return packaged[0]
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    return None

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)


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
        path = _find_lib()
        if path is None:
            if not _build():
                _lib_failed = True
                return None
            path = _LIB_PATH
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            utils.logger.warning("cannot load native lib: %s", e)
            _lib_failed = True
            return None
        lib.snickery_detect_epochs.restype = ctypes.c_int
        lib.snickery_detect_epochs.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            _i32p, ctypes.c_int,
        ]
        lib.snickery_detect_epochs_batch.restype = ctypes.c_int
        lib.snickery_detect_epochs_batch.argtypes = [
            _f32p, _i64p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            _i32p, _i64p, _i32p,
        ]
        if hasattr(lib, "snickery_detect_epochs_batch_mt"):
            # multithreaded batch entry (newer library builds only; the
            # serial symbol remains the fallback for stale .so files)
            lib.snickery_detect_epochs_batch_mt.restype = ctypes.c_int
            lib.snickery_detect_epochs_batch_mt.argtypes = [
                _f32p, _i64p, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                _i32p, _i64p, _i32p, ctypes.c_int,
            ]
        _lib = lib
        return _lib


def _max_marks(n_samples: int, sr: int, unvoiced_period_sec: float) -> int:
    return max(64, int(n_samples / max(sr * unvoiced_period_sec, 1) * 4))


def native_detect_epochs(
    wave: np.ndarray, sr: int, fmin: float = 50.0, fmax: float = 400.0,
    unvoiced_period_sec: float = 0.005,
) -> np.ndarray | None:
    """Run the C++ epoch detector; None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    wave32 = np.ascontiguousarray(wave, dtype=np.float32)
    max_marks = _max_marks(len(wave32), sr, unvoiced_period_sec)
    out = np.zeros(max_marks, dtype=np.int32)
    n = lib.snickery_detect_epochs(
        wave32.ctypes.data_as(_f32p), len(wave32),
        int(sr), float(fmin), float(fmax), float(unvoiced_period_sec),
        out.ctypes.data_as(_i32p), max_marks)
    if n < 0:
        return None
    return np.unique(out[:n])


def native_detect_epochs_batch(
    waves: list, sr: int, fmin: float = 50.0, fmax: float = 400.0,
    unvoiced_period_sec: float = 0.005, n_threads: int | None = None,
) -> list | None:
    """Whole-corpus epoch detection in ONE foreign call.

    Concatenates the utterance waveforms and hands the C++ detector the
    offset table, so per-utterance python/ctypes dispatch overhead vanishes
    from the corpus-prep loop (the dominant prep pass on the single-core
    bench VM).  Per-utterance results are bit-identical to
    :func:`native_detect_epochs` (the batch entry loops the same C scalar
    routine; the same np.unique post-pass is applied here).

    ``n_threads``: worker threads for the C++ side (utterances are
    independent; per-utterance output is bit-identical at any count).
    ``None`` = one per CPU (``SNICKERY_EPOCH_THREADS`` overrides).  The GIL
    is released for the duration of the foreign call, so on multi-core
    deployment hosts the corpus pass scales near-linearly; on this repo's
    single-core bench VM the MT entry simply degrades to the serial loop.
    Returns None if the native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n_utts = len(waves)
    if n_utts == 0:
        return []
    if n_threads is None:
        n_threads = int(os.environ.get("SNICKERY_EPOCH_THREADS",
                                       os.cpu_count() or 1))
    offsets = np.zeros(n_utts + 1, dtype=np.int64)
    for i, w in enumerate(waves):
        offsets[i + 1] = offsets[i] + len(w)
    buf = np.empty(int(offsets[-1]), dtype=np.float32)
    for i, w in enumerate(waves):
        buf[offsets[i]: offsets[i + 1]] = np.asarray(w, dtype=np.float32)
    caps = np.zeros(n_utts + 1, dtype=np.int64)
    for i, w in enumerate(waves):
        caps[i + 1] = caps[i] + _max_marks(len(w), sr, unvoiced_period_sec)
    marks = np.zeros(int(caps[-1]), dtype=np.int32)
    counts = np.zeros(n_utts, dtype=np.int32)
    if hasattr(lib, "snickery_detect_epochs_batch_mt"):
        rc = lib.snickery_detect_epochs_batch_mt(
            buf.ctypes.data_as(_f32p), offsets.ctypes.data_as(_i64p),
            n_utts, int(sr), float(fmin), float(fmax),
            float(unvoiced_period_sec),
            marks.ctypes.data_as(_i32p), caps.ctypes.data_as(_i64p),
            counts.ctypes.data_as(_i32p), max(1, int(n_threads)))
    else:
        rc = lib.snickery_detect_epochs_batch(
            buf.ctypes.data_as(_f32p), offsets.ctypes.data_as(_i64p),
            n_utts, int(sr), float(fmin), float(fmax),
            float(unvoiced_period_sec),
            marks.ctypes.data_as(_i32p), caps.ctypes.data_as(_i64p),
            counts.ctypes.data_as(_i32p))
    if rc < 0:
        return None
    return [np.unique(marks[caps[i]: caps[i] + counts[i]])
            for i in range(n_utts)]
