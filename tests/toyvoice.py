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

PHONES = ["a", "e", "i", "o", "u", "s", "t", "k"]
# crude 'formant' amplitude patterns per phone (harmonics 1..6)
AMPS = {
    "a": [0.5, 0.4, 0.3, 0.1, 0.05, 0.02],
    "e": [0.5, 0.2, 0.4, 0.2, 0.05, 0.02],
    "i": [0.4, 0.1, 0.1, 0.4, 0.2, 0.05],
    "o": [0.6, 0.3, 0.1, 0.05, 0.02, 0.01],
    "u": [0.6, 0.15, 0.05, 0.02, 0.01, 0.005],
    "s": [0.05, 0.05, 0.1, 0.2, 0.3, 0.3],
    "t": [0.1, 0.1, 0.2, 0.2, 0.2, 0.1],
    "k": [0.2, 0.3, 0.1, 0.1, 0.1, 0.05],
}


def synth_utterance(seed: int, n_segments: int = 8, seg_sec: float = 0.15):
    """Random phone sequence -> (wave, segments) with per-segment envelopes."""
    rng = np.random.default_rng(seed)
    phones = [PHONES[i] for i in rng.integers(0, len(PHONES), n_segments)]
    seg_len = int(seg_sec * SR)
    n = seg_len * n_segments
    t = np.arange(n) / SR
    f0 = 110.0 + 30.0 * np.sin(2 * np.pi * (0.4 + 0.2 * rng.random()) * t + rng.random() * 6)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wave = np.zeros(n)
    for si, ph in enumerate(phones):
        sl = slice(si * seg_len, (si + 1) * seg_len)
        amps = AMPS[ph]
        seg = sum(a * np.sin((h + 1) * phase[sl]) for h, a in enumerate(amps))
        wave[sl] = seg
    # gentle fade at segment boundaries to avoid clicks
    wave *= 0.9
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
