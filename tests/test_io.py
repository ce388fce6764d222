"""I/O round-trip tests (streams, wav, EST pitchmarks, HTS labels)."""

import numpy as np

from snickery_tpu.io import (
    get_speech, put_speech, read_wave, write_wave,
    read_est_pitchmarks, write_est_pitchmarks,
    read_hts_label, halfphone_segments,
)


def test_stream_roundtrip(tmp_path, rng):
    data = rng.standard_normal((50, 13)).astype(np.float32)
    p = str(tmp_path / "x.mfcc")
    put_speech(data, p)
    back = get_speech(p, 13)
    np.testing.assert_array_equal(data, back)


def test_wav_roundtrip(tmp_path, toy_wave):
    wave, sr = toy_wave
    p = str(tmp_path / "x.wav")
    write_wave(wave, p, sr)
    back, sr2 = read_wave(p)
    assert sr2 == sr
    assert back.shape == wave.shape
    assert np.abs(back - np.clip(wave, -1, 1)).max() < 2.0 / 32768


def test_est_pitchmark_roundtrip(tmp_path):
    sr = 16000
    marks = np.array([100, 233, 366, 500, 647], dtype=np.int32)
    p = str(tmp_path / "x.pm")
    write_est_pitchmarks(marks, p, sr)
    back = read_est_pitchmarks(p, sr)
    np.testing.assert_array_equal(marks, back)


def test_bare_pitchmark_text(tmp_path):
    p = str(tmp_path / "x.pm")
    with open(p, "w") as f:
        f.write("0.010\n0.020\n-0.001\n0.030\n")
    back = read_est_pitchmarks(p, 16000)
    np.testing.assert_array_equal(back, [160, 320, 480])


def test_hts_label_and_halfphones(tmp_path):
    p = str(tmp_path / "x.lab")
    # two phones with full-context names, second with state alignment
    with open(p, "w") as f:
        f.write("0 1000000 xx^sil-a+b=c@1_2\n")
        f.write("1000000 1500000 sil^a-b+c=xx@1_2[2]\n")
        f.write("1500000 2500000 sil^a-b+c=xx@1_2[3]\n")
        f.write("2500000 3000000 sil^a-b+c=xx@1_2[4]\n")
    phones = read_hts_label(p)
    assert len(phones) == 2
    assert phones[0].phone == "a"
    assert phones[1].phone == "b"
    assert phones[1].quinphone == ("sil", "a", "b", "c", "xx")
    halves = halfphone_segments(phones)
    assert [h.name for h in halves] == ["a_L", "a_R", "b_L", "b_R"]
    # state-aligned phone b splits at its middle state boundary (0.25s)
    assert abs(halves[2].end_sec - 0.25) < 1e-9
    assert abs(halves[3].start_sec - 0.25) < 1e-9


def test_stereo_int16_wav_normalised(tmp_path, toy_wave):
    """Stereo integer PCM must be scaled to [-1,1] BEFORE downmixing."""
    from scipy.io import wavfile
    wave, sr = toy_wave
    stereo = np.stack([wave, 0.5 * wave], axis=1)
    pcm = (np.clip(stereo, -1, 1) * 32767).astype(np.int16)
    p = str(tmp_path / "stereo.wav")
    wavfile.write(p, sr, pcm)
    back, sr2 = read_wave(p)
    assert back.ndim == 1 and sr2 == sr
    assert np.abs(back).max() <= 1.0
    np.testing.assert_allclose(back, stereo.mean(axis=1), atol=2e-4)
