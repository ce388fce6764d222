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


# ------------------------------------------------------------- round 4:
# adversarial real-world format variants (VERDICT r4 item 7) — every case
# either parses correctly or rejects with an actionable message; never a
# silent misparse.

import pytest


def test_est_unknown_header_fields_ignored(tmp_path):
    p = str(tmp_path / "x.pm")
    with open(p, "w") as f:
        f.write("EST_File Track\n")
        f.write("DataType ascii\n")
        f.write("CommentWeirdField some value with spaces\n")   # unseen field
        f.write("ByteOrder 10\n")
        f.write("EST_Header_End\n")
        f.write("0.010 1 1\n0.020 1 1\n")
    np.testing.assert_array_equal(
        read_est_pitchmarks(p, 16000), [160, 320])


def test_est_binary_rejected(tmp_path):
    p = str(tmp_path / "x.pm")
    with open(p, "wb") as f:
        f.write(b"EST_File Track\nDataType binary\nEST_Header_End\n")
        f.write(np.arange(5, dtype=np.float32).tobytes())
    with pytest.raises(ValueError, match="binary"):
        read_est_pitchmarks(p, 16000)


def test_est_truncated_header_rejected(tmp_path):
    p = str(tmp_path / "x.pm")
    with open(p, "w") as f:
        f.write("EST_File Track\nDataType ascii\n0.010 1 1\n")  # no Header_End
    with pytest.raises(ValueError, match="EST_Header_End"):
        read_est_pitchmarks(p, 16000)


def test_est_empty_but_valid_track(tmp_path):
    p = str(tmp_path / "x.pm")
    write_est_pitchmarks(np.zeros(0, np.int32), p, 16000)
    assert len(read_est_pitchmarks(p, 16000)) == 0


def test_est_garbage_file_rejected(tmp_path):
    p = str(tmp_path / "x.pm")
    with open(p, "w") as f:
        f.write("this is not\na pitchmark file\n")
    with pytest.raises(ValueError, match="no parseable"):
        read_est_pitchmarks(p, 16000)


def test_est_unsorted_duplicate_marks(tmp_path):
    p = str(tmp_path / "x.pm")
    with open(p, "w") as f:
        f.write("0.030\n0.010\n0.020\n0.010\n")    # shuffled + duplicate
    np.testing.assert_array_equal(
        read_est_pitchmarks(p, 16000), [160, 320, 480])


def test_est_millisecond_units_autodetected(tmp_path):
    # the same marks written in ms: spacing ~5 "seconds" is impossible as
    # pitch periods, so the reader converts (and an explicit units='ms'
    # gives the identical answer)
    p = str(tmp_path / "x.pm")
    with open(p, "w") as f:
        f.write("".join(f"{t:.1f}\n" for t in [10.0, 15.0, 20.0, 25.0, 30.0]))
    auto = read_est_pitchmarks(p, 16000)
    explicit = read_est_pitchmarks(p, 16000, units="ms")
    np.testing.assert_array_equal(auto, explicit)
    np.testing.assert_array_equal(auto, [160, 240, 320, 400, 480])
    # and an explicit 's' overrides the heuristic
    forced = read_est_pitchmarks(p, 16000, units="s")
    np.testing.assert_array_equal(forced, [160000, 240000, 320000, 400000, 480000])


def test_est_implausible_units_rejected(tmp_path):
    p = str(tmp_path / "x.pm")
    with open(p, "w") as f:   # spacing ~5000 s: not seconds, not ms
        f.write("0\n5000\n10000\n15000\n")
    with pytest.raises(ValueError, match="implausible"):
        read_est_pitchmarks(p, 16000)


def test_label_seconds_autodetected(tmp_path):
    # Festival-style label already in seconds: fractional values make the
    # HTK-unit reading impossible
    p = str(tmp_path / "x.lab")
    with open(p, "w") as f:
        f.write("0.0 0.10 xx^sil-a+b=c@1_2\n")
        f.write("0.10 0.25 sil^a-b+c=xx@1_2\n")
    phones = read_hts_label(p)
    assert len(phones) == 2
    assert abs(phones[0].end_sec - 0.10) < 1e-9
    assert abs(phones[1].end_sec - 0.25) < 1e-9


def test_label_overlapping_rows_rejected(tmp_path):
    p = str(tmp_path / "x.lab")
    with open(p, "w") as f:
        f.write("0 1000000 xx^sil-a+b=c@1_2\n")
        f.write("500000 1500000 sil^a-b+c=xx@1_2\n")    # overlaps row 0
    with pytest.raises(ValueError, match="overlap"):
        read_hts_label(p)


def test_label_negative_length_rejected(tmp_path):
    p = str(tmp_path / "x.lab")
    with open(p, "w") as f:
        f.write("1000000 500000 xx^sil-a+b=c@1_2\n")    # ends before start
    with pytest.raises(ValueError, match="ends before"):
        read_hts_label(p)


def test_label_zero_length_dropped(tmp_path):
    p = str(tmp_path / "x.lab")
    with open(p, "w") as f:
        f.write("0 1000000 xx^sil-a+b=c@1_2\n")
        f.write("1000000 1000000 sil^a-b+c=xx@1_2\n")   # zero-length
        f.write("1000000 2000000 a^b-c+d=e@1_2\n")
    phones = read_hts_label(p)
    assert [s.phone for s in phones] == ["a", "c"]


def test_label_silence_gaps_allowed(tmp_path):
    # gaps between rows (un-labelled silence) are legitimate, only overlaps
    # are corrupt
    p = str(tmp_path / "x.lab")
    with open(p, "w") as f:
        f.write("0 1000000 xx^sil-a+b=c@1_2\n")
        f.write("2000000 3000000 sil^a-b+c=xx@1_2\n")
    assert len(read_hts_label(p)) == 2


def test_label_missing_quinphone_fields(tmp_path):
    # triphone-only and bare-phone model names back off instead of failing
    p = str(tmp_path / "x.lab")
    with open(p, "w") as f:
        f.write("0 1000000 sil-a+b\n")       # triphone
        f.write("1000000 2000000 b\n")       # bare phone
    phones = read_hts_label(p)
    assert phones[0].phone == "a"
    assert phones[0].quinphone == ("xx", "sil", "a", "b", "xx")
    assert phones[1].phone == "b"
    assert phones[1].quinphone == ("xx", "xx", "b", "xx", "xx")


# ------------------------------------------------------------- round 5:
# adversarial wav front door (VERDICT r4 item 7): the audio equivalent of
# the round-4 EST/HTS hardening — handle or reject-with-message, never a
# silent misparse.  scipy silently returns PARTIAL data for a truncated
# data chunk and passes sr=0 / NaN floats straight through; read_wave
# must not.

def _wav_header(sr, n_bytes, bits=16, channels=1, fmt=1):
    import struct
    block = channels * bits // 8
    return (b"RIFF" + struct.pack("<I", 36 + n_bytes) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, fmt, channels, sr,
                          sr * block, block, bits)
            + b"data" + struct.pack("<I", n_bytes))


def test_wav_truncated_header_rejected(tmp_path):
    p = str(tmp_path / "trunc.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF\x10\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="trunc.wav"):
        read_wave(p)


def test_wav_garbage_rejected(tmp_path):
    p = str(tmp_path / "garbage.wav")
    with open(p, "wb") as f:
        f.write(b"\x00\x01\x02not a riff file at all" * 10)
    with pytest.raises(ValueError, match="garbage.wav"):
        read_wave(p)


def test_wav_truncated_data_accepted_with_warning(tmp_path, toy_wave, caplog):
    """Header promises more bytes than the file holds (sloppy writers do
    this): scipy's silent partial read becomes a LOGGED warning naming the
    file, and the partial samples come back."""
    import logging
    from scipy.io import wavfile
    wave, sr = toy_wave
    ok = str(tmp_path / "ok.wav")
    wavfile.write(ok, sr, (np.clip(wave, -1, 1) * 32767).astype(np.int16))
    blob = open(ok, "rb").read()
    p = str(tmp_path / "cut.wav")
    with open(p, "wb") as f:
        f.write(blob[: 44 + 2 * (len(wave) // 2)])
    with caplog.at_level(logging.WARNING, logger="snickery_tpu.io.speech"):
        back, sr2 = read_wave(p)
    assert sr2 == sr
    assert 0 < len(back) <= len(wave) // 2 + 1
    assert any("cut.wav" in r.getMessage() for r in caplog.records)


def test_wav_zero_samples_rejected(tmp_path):
    from scipy.io import wavfile
    p = str(tmp_path / "empty.wav")
    wavfile.write(p, 16000, np.zeros(0, np.int16))
    with pytest.raises(ValueError, match="zero audio samples"):
        read_wave(p)


def test_wav_zero_sample_rate_rejected(tmp_path):
    data = np.zeros(64, np.int16).tobytes()
    p = str(tmp_path / "sr0.wav")
    with open(p, "wb") as f:
        f.write(_wav_header(0, len(data)) + data)
    with pytest.raises(ValueError, match="sample rate"):
        read_wave(p)


def test_wav_nan_float_rejected(tmp_path):
    from scipy.io import wavfile
    x = np.zeros(256, np.float32)
    x[13] = np.nan
    p = str(tmp_path / "nan.wav")
    wavfile.write(p, 16000, x)
    with pytest.raises(ValueError, match="NaN/inf"):
        read_wave(p)


def test_wav_uint8_scaled(tmp_path):
    from scipy.io import wavfile
    x = np.array([0, 128, 255], np.uint8)
    p = str(tmp_path / "u8.wav")
    wavfile.write(p, 8000, x)
    back, sr = read_wave(p)
    assert sr == 8000
    np.testing.assert_allclose(back, [-1.0, 0.0, 127.0 / 128.0], atol=1e-6)


def test_wav_24bit_scaled(tmp_path, toy_wave):
    """24-bit PCM (scipy returns int32 with the low byte zero)."""
    import wave as wavemod
    w, sr = toy_wave
    x24 = (np.clip(w, -1, 1) * (2**23 - 1)).astype(np.int64)
    p = str(tmp_path / "w24.wav")
    ww = wavemod.open(p, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(3)
    ww.setframerate(sr)
    ww.writeframes(b"".join(int(v).to_bytes(3, "little", signed=True)
                            for v in x24))
    ww.close()
    back, sr2 = read_wave(p)
    assert sr2 == sr
    np.testing.assert_allclose(back, np.clip(w, -1, 1), atol=3e-7)


def test_wav_float64_converted(tmp_path, toy_wave):
    from scipy.io import wavfile
    w, sr = toy_wave
    p = str(tmp_path / "f64.wav")
    wavfile.write(p, sr, np.asarray(w, np.float64))
    back, sr2 = read_wave(p)
    assert back.dtype == np.float32
    np.testing.assert_allclose(back, w, atol=1e-6)


def test_wav_clipped_and_dc_offset_handled(tmp_path, toy_wave):
    """Clipped / DC-offset audio is VALID input: comes back finite, in
    [-1, 1], with the offset preserved (the epoch detector removes the
    per-segment mean itself)."""
    from scipy.io import wavfile
    w, sr = toy_wave
    dirty = np.clip(2.5 * w + 0.2, -1, 1)
    p = str(tmp_path / "dirty.wav")
    wavfile.write(p, sr, (dirty * 32767).astype(np.int16))
    back, _ = read_wave(p)
    assert np.isfinite(back).all()
    assert np.abs(back).max() <= 1.0
    assert abs(float(back.mean()) - float(dirty.mean())) < 1e-3
