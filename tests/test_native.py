"""Native (C++) runtime pieces: build, epoch-detector agreement, stream I/O."""

import numpy as np
import pytest

from snickery_tpu.native import get_lib, native_detect_epochs, native_read_stream
from snickery_tpu.features.epochs import detect_epochs
from snickery_tpu.io.speech import put_speech

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


def test_native_stream_reader(tmp_path, rng):
    data = rng.standard_normal((40, 7)).astype(np.float32)
    p = str(tmp_path / "x.stream")
    put_speech(data, p)
    back = native_read_stream(p, 7)
    np.testing.assert_array_equal(back, data)
    assert native_read_stream(str(tmp_path / "missing"), 7) is None
