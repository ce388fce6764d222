"""Native (C++) runtime pieces: build, epoch-detector agreement, batch entry."""

import numpy as np
import pytest

from snickery_tpu.native import (
    get_lib,
    native_detect_epochs,
    native_detect_epochs_batch,
)
from snickery_tpu.features.epochs import detect_epochs, detect_epochs_batch

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")


def test_native_epochs_match_python(toy_wave):
    wave, sr = toy_wave
    native = native_detect_epochs(wave, sr)
    python = detect_epochs(wave, sr, use_native=False)
    assert native is not None
    # same marks up to a few samples of peak-picking jitter
    d = np.abs(native[None, :] - python[:, None]).min(axis=1)
    assert (d <= 3).mean() > 0.97, f"agreement {(d <= 3).mean()}"
    assert abs(len(native) - len(python)) <= 2


def test_detect_epochs_dispatches_native(toy_wave):
    wave, sr = toy_wave
    via_dispatch = detect_epochs(wave, sr, use_native=True)
    direct = native_detect_epochs(wave, sr)
    np.testing.assert_array_equal(via_dispatch, direct)


def test_batch_entry_bit_identical_to_scalar(toy_wave, rng):
    """The one-call C batch path must agree exactly with per-utterance
    scalar calls (it loops the same C routine internally)."""
    wave, sr = toy_wave
    waves = [wave, wave[: len(wave) // 2],
             rng.standard_normal(sr // 2).astype(np.float32) * 0.1]
    batch = native_detect_epochs_batch(waves, sr)
    assert batch is not None and len(batch) == len(waves)
    for w, marks in zip(waves, batch):
        np.testing.assert_array_equal(marks, native_detect_epochs(w, sr))


def test_detect_epochs_batch_dispatches_native(toy_wave):
    wave, sr = toy_wave
    waves = [wave, wave[: len(wave) // 3]]
    via_dispatch = detect_epochs_batch(waves, sr)
    direct = native_detect_epochs_batch(waves, sr)
    for a, b in zip(via_dispatch, direct):
        np.testing.assert_array_equal(a, b)


def test_batch_mt_bit_identical_any_thread_count(toy_wave, rng):
    """The multithreaded batch entry writes disjoint output slices with the
    same scalar routine, so results are bit-identical at every thread count
    (including counts above the utterance count and above the core count)."""
    wave, sr = toy_wave
    waves = [wave, wave[: len(wave) // 2], wave[: len(wave) // 3],
             rng.standard_normal(sr // 2).astype(np.float32) * 0.1]
    serial = native_detect_epochs_batch(waves, sr, n_threads=1)
    assert serial is not None
    for nt in (2, 4, 16):
        mt = native_detect_epochs_batch(waves, sr, n_threads=nt)
        for a, b in zip(serial, mt):
            np.testing.assert_array_equal(a, b)
