"""Feature extraction tests: epochs, magphase roundtrip, MFCC, STFT."""

import numpy as np

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


def test_detect_epochs_ground_truth():
    """Analytic GCI ground truth: an impulse train (known glottal closure
    instants) through a decaying-resonance filter.  Detected marks must
    align 1:1 with the true GCIs up to a constant filter delay, with small
    jitter (VERDICT round 1, weak #7)."""
    sr = 16000
    rng = np.random.default_rng(5)
    # variable period 120-200 samples (80-133 Hz), 1.5 s
    gcis = [400]
    while gcis[-1] < int(1.5 * sr):
        period = 160 + 40 * np.sin(len(gcis) / 7.0)
        gcis.append(gcis[-1] + int(round(period)))
    gcis = np.asarray(gcis[:-1], np.int64)
    exc = np.zeros(int(1.6 * sr), np.float32)
    exc[gcis] = 1.0
    # glottal-ish pulse: two decaying resonances (formant-like)
    from scipy import signal as sps
    wave = exc.copy()
    for freq, bw in [(500, 80), (1500, 120)]:
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * freq / sr
        wave = sps.lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], wave)
    wave = (wave / np.abs(wave).max()).astype(np.float32)

    marks = detect_epochs(wave, sr, use_native=False)
    # keep marks inside the excited region
    marks = marks[(marks > gcis[0] - 100) & (marks < gcis[-1] + 100)]
    # 1:1 matching within half a min period
    d = np.abs(marks[:, None] - gcis[None, :])
    signed = marks - gcis[d.argmin(axis=1)]      # per-mark offset to nearest GCI
    offset = np.median(signed)                   # constant filter delay
    jitter = np.abs(signed - offset)
    # >95% of marks within 1 ms of a true GCI (after constant delay)
    assert (jitter < 0.001 * sr).mean() > 0.95, (
        f"GCI jitter p95 {np.percentile(jitter, 95):.1f} samples")
    # recall: every true GCI has a mark within half a period
    dd = np.abs(gcis[:, None] - marks[None, :]).min(axis=1)
    assert (dd < 80).mean() > 0.95, f"GCI recall {(dd < 80).mean():.3f}"
    # count parity: no doubled or halved marking
    assert 0.9 < len(marks) / len(gcis) < 1.1


def test_world_streams(toy_wave):
    """Native WORLD-family analysis: shapes + bap separates harmonic frames
    from noise (periodic -> deep inter-harmonic valleys -> bap << 0)."""
    from snickery_tpu.features.world import world_analysis
    wave, sr = toy_wave
    marks = detect_epochs(wave, sr, use_native=False)
    w = world_analysis(wave, marks, sr, n_mgc=24, n_bap=5)
    E = len(marks)
    assert w["mgc"].shape == (E, 24)
    assert w["bap"].shape == (E, 5)
    assert w["lf0"].shape == (E, 1)
    assert np.isfinite(w["mgc"]).all() and np.isfinite(w["bap"]).all()
    bap_tone = np.median(w["bap"][5:-5, 0])

    rng = np.random.default_rng(7)
    noise = rng.standard_normal(len(wave)).astype(np.float32) * 0.3
    marks_n = np.arange(200, len(noise) - 200, 130, dtype=np.int32)
    wn = world_analysis(noise, marks_n, sr, n_mgc=24, n_bap=5)
    bap_noise = np.median(wn["bap"][5:-5, 0])
    assert bap_tone < bap_noise - 1.0, (
        f"bap should be much lower for periodic signals: "
        f"tone {bap_tone:.2f} vs noise {bap_noise:.2f}")


def test_resample_fixed_epoch_roundtrip(toy_wave):
    """epoch-rate -> fixed-rate -> epoch-rate is close to identity for
    smooth trajectories (linear interpolation both ways)."""
    from snickery_tpu.features.world import resample_to_epochs, resample_to_fixed
    wave, sr = toy_wave
    marks = detect_epochs(wave, sr, use_native=False).astype(np.int64)
    E = len(marks)
    t = np.linspace(0, 4 * np.pi, E)
    feats = np.stack([np.sin(t), np.cos(0.5 * t), t / 10], axis=1).astype(np.float32)
    fx = resample_to_fixed(feats, marks, sr, frameshift=0.005)
    assert len(fx) > 50
    back = resample_to_epochs(fx, marks, sr, frameshift=0.005)
    # interior epochs (edges extrapolate by clamping)
    np.testing.assert_allclose(back[2:-2], feats[2:-2], atol=0.02)


def test_epoch_grid_from_lf0():
    """Integrating a constant 100 Hz lf0 gives epochs 160 samples apart."""
    from snickery_tpu.features.world import epoch_grid_from_lf0
    sr, shift = 16000, 0.005
    lf0 = np.full(200, np.log(100.0), np.float32)   # 1 s of 100 Hz
    epochs = epoch_grid_from_lf0(lf0, sr, shift)
    gaps = np.diff(epochs)
    assert np.abs(gaps - 160).max() <= 1
    assert abs(len(epochs) - 100) <= 2


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


def test_detect_epochs_batch_matches_serial():
    """Thread-parallel corpus epoch detection is bit-identical to the
    serial loop (the native detector is stateless)."""
    import sys
    sys.path.insert(0, "tests")
    from toyvoice import synth_utterance
    from snickery_tpu.features.epochs import detect_epochs, detect_epochs_batch

    waves = [synth_utterance(600 + i, n_segments=6)[0] for i in range(5)]
    serial = [detect_epochs(w, 16000) for w in waves]
    par = detect_epochs_batch(waves, 16000, n_threads=4)
    assert len(par) == len(serial)
    for a, b in zip(serial, par):
        np.testing.assert_array_equal(a, b)


def test_streaming_resampler_matches_batch(rng):
    """Incremental fixed-rate -> epoch conversion must reproduce the batch
    conversion: identical epoch grid, rows equal to interpolation rounding
    (the hybrid-streaming front half, BASELINE config #4)."""
    from snickery_tpu.features.world import (
        StreamingEpochResampler, fixed_to_epoch_targets)

    N, d, lf0_col = 300, 9, 4
    feats = rng.standard_normal((N, d)).astype(np.float32)
    feats[:, lf0_col] = np.log(110 + 50 * np.sin(np.arange(N) / 25.0))
    ref_feats, ref_epochs = fixed_to_epoch_targets(feats, lf0_col, 16000, 0.005)
    for chunk in (1, 5, 37, N):
        rs = StreamingEpochResampler(lf0_col, 16000, 0.005)
        outs = [rs.push(feats[i:i + chunk]) for i in range(0, N, chunk)]
        outs.append(rs.flush())
        got = np.concatenate([o for o in outs if o.size], axis=0)
        np.testing.assert_array_equal(
            np.asarray(rs.epochs, np.int64), ref_epochs)
        assert got.shape == ref_feats.shape
        np.testing.assert_allclose(got, ref_feats, atol=2e-6)


def test_stft_mag_matches_abs_stft(toy_wave):
    """stft_mag is the TPU-safe magnitude entry point: complex64 arrays
    cannot cross the host<->device boundary on the tunnelled TPU runtime
    (UNIMPLEMENTED at transfer), so |STFT| must be computable in ONE jitted
    program with a real output.  On CPU both paths work; they must agree."""
    import numpy as np

    from snickery_tpu.features.stft import stft, stft_mag

    wave, _sr = toy_wave
    w = np.asarray(wave[:4096], np.float32)
    m = np.asarray(stft_mag(w, 256, 128))
    ref = np.abs(np.asarray(stft(w, 256, 128)))
    assert m.dtype == np.float32
    np.testing.assert_allclose(m, ref, atol=1e-5)
