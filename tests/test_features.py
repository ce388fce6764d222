"""Feature extraction tests: epochs, magphase roundtrip, MFCC, STFT."""

import numpy as np
import pytest

from snickery_tpu.features import (
    detect_epochs, f0_from_epochs, magphase_analysis, magphase_synthesis,
    mfcc, log_mel_spectrogram, stft, istft,
)


def test_detect_epochs_rate(toy_wave):
    wave, sr = toy_wave
    marks = detect_epochs(wave, sr, use_native=False)
    assert 90 < len(marks) < 150          # f0 sweeps 100..140 Hz over 1 s
    gaps = np.diff(marks)
    assert (gaps > sr / 200).all() and (gaps < sr / 80).all()


def test_f0_from_epochs(toy_wave):
    wave, sr = toy_wave
    marks = detect_epochs(wave, sr, use_native=False)
    lf0 = f0_from_epochs(marks, sr)
    f0 = np.exp(lf0.ravel())
    assert f0.shape[0] == len(marks)
    assert 95 < np.median(f0) < 145


def test_magphase_copy_synthesis(toy_wave):
    wave, sr = toy_wave
    marks = detect_epochs(wave, sr, use_native=False)
    streams = magphase_analysis(wave, marks, sr)
    assert streams["mag"].shape == (len(marks), 60)
    assert streams["real"].shape == (len(marks), 45)
    out = magphase_synthesis(streams, sr, n_samples=len(wave), epoch_samples=marks)
    a, b = wave[2000:14000], out[2000:14000]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.90, f"copy-synthesis corr {corr}"


def test_magphase_empty():
    streams = magphase_analysis(np.zeros(0, np.float32), np.zeros(0, np.int32), 16000)
    assert streams["mag"].shape == (0, 60)
    out = magphase_synthesis(streams, 16000)
    assert out.shape == (0,)


def test_mfcc_shapes(toy_wave):
    wave, sr = toy_wave
    m = np.asarray(mfcc(wave, sr))
    assert m.shape[1] == 13
    assert np.isfinite(m).all()
    lm = np.asarray(log_mel_spectrogram(wave, sr))
    assert lm.shape[1] == 80


def test_stft_istft_reconstruction(toy_wave):
    wave, sr = toy_wave
    spec = stft(wave, 512, 128)
    back = np.asarray(istft(spec, 512, 128, len(wave)))
    err = np.abs(back[512:-512] - wave[512:-512]).max()
    assert err < 1e-3, f"iSTFT reconstruction err {err}"
