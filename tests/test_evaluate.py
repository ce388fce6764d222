"""Objective quality metrics: MCD + join discontinuity."""

import numpy as np

from snickery_tpu.evaluate import (
    dtw_path, f0_metrics, join_discontinuity, mel_cepstral_distortion, nsim,
)


def test_nsim_identity_is_one(toy_wave):
    wave, sr = toy_wave
    assert nsim(wave, wave, sr) > 0.9999


def test_nsim_orders_degradation(toy_wave, rng):
    wave, sr = toy_wave
    noise = rng.standard_normal(len(wave)).astype(np.float32)
    scores = [nsim(wave + a * noise, wave, sr) for a in (0.01, 0.1, 0.5)]
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 0.8                # mild degradation stays high
    assert nsim(noise, wave, sr) < 0.2    # uncorrelated content near 0


def test_nsim_handles_length_mismatch(toy_wave):
    wave, sr = toy_wave
    shorter = wave[: int(0.8 * len(wave))]
    assert nsim(shorter, wave, sr) > 0.95  # DTW absorbs the truncation


def test_nsim_gain_invariant(toy_wave):
    wave, sr = toy_wave
    assert nsim(0.25 * wave, wave, sr) > 0.9999


def test_mcd_identity_is_zero(toy_wave):
    wave, sr = toy_wave
    assert mel_cepstral_distortion(wave, wave, sr) < 1e-4


def test_mcd_orders_degradation(toy_wave, rng):
    wave, sr = toy_wave
    slight = wave + 0.01 * rng.standard_normal(len(wave)).astype(np.float32)
    heavy = wave + 0.3 * rng.standard_normal(len(wave)).astype(np.float32)
    m_slight = mel_cepstral_distortion(slight, wave, sr)
    m_heavy = mel_cepstral_distortion(heavy, wave, sr)
    assert 0 < m_slight < m_heavy


def test_mcd_handles_length_mismatch(toy_wave):
    wave, sr = toy_wave
    shorter = wave[: int(0.8 * len(wave))]
    m = mel_cepstral_distortion(shorter, wave, sr)
    assert np.isfinite(m) and m < 5.0     # DTW absorbs the truncation


def test_dtw_diagonal_for_identical():
    cost = 1.0 - np.eye(6)
    pi, pj = dtw_path(cost)
    assert (pi == pj).all()


def test_join_discontinuity_flags_clicks(toy_wave, rng):
    wave, sr = toy_wave
    joins = np.arange(2000, len(wave) - 2000, 2000)
    smooth = join_discontinuity(wave, sr, joins)
    clicky = wave.copy()
    for j in joins:                       # hard discontinuities at joins
        clicky[j:] = -clicky[j:]
    r2 = join_discontinuity(clicky, sr, joins)
    assert r2["ratio"] > smooth["ratio"]


def test_f0_metrics_identity(toy_wave):
    wave, sr = toy_wave
    m = f0_metrics(wave, wave, sr)
    assert m["vde"] == 0.0
    assert m["gpe"] == 0.0
    assert m["ffe"] == 0.0
    assert m["f0_rmse_hz"] < 1.0


def test_f0_metrics_flags_pitch_shift(toy_wave):
    wave, sr = toy_wave
    # same spectral envelope machinery, f0 scaled 1.4x (>20% => gross error)
    t = np.arange(sr) / sr
    f0 = 1.4 * (120.0 + 20.0 * np.sin(2 * np.pi * 0.7 * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    shifted = (0.5 * np.sin(phase) + 0.25 * np.sin(2 * phase)
               + 0.12 * np.sin(3 * phase)).astype(np.float32)
    m = f0_metrics(shifted, wave, sr)
    assert m["gpe"] > 0.5
    assert m["f0_rmse_hz"] > 20.0
    assert m["ffe"] >= m["gpe"]


def test_f0_metrics_flags_voicing_error(toy_wave, rng):
    wave, sr = toy_wave
    noise = 0.3 * rng.standard_normal(len(wave)).astype(np.float32)
    m = f0_metrics(noise, wave, sr)
    assert m["vde"] > 0.5


def test_quality_script(tmp_path, toy_wave):
    import scripts.evaluate_quality as eq
    from snickery_tpu.io.speech import write_wave
    wave, sr = toy_wave
    (tmp_path / "synth").mkdir(); (tmp_path / "ref").mkdir()
    write_wave(wave, str(tmp_path / "synth" / "a.wav"), sr)
    write_wave(wave, str(tmp_path / "ref" / "a.wav"), sr)
    assert eq.main(["-s", str(tmp_path / "synth"), "-r", str(tmp_path / "ref")]) == 0
