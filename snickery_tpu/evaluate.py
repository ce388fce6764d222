"""Objective quality evaluation.

The reference validated quality by MUSHRA listening tests (SURVEY.md §4) —
not reproducible here.  This module provides the standard objective proxy:
mel-cepstral distortion (MCD) between synthesised and reference audio, with
DTW alignment (synthesis output lengths differ from the originals), plus a
join-discontinuity measure (mean spectral flux at unit boundaries vs within
units — joins that 'pop' show elevated boundary flux).
"""

from __future__ import annotations

import numpy as np

from snickery_tpu.features.mel import mfcc

_MCD_CONST = 10.0 / np.log(10.0) * np.sqrt(2.0)
# MCD analysis parameters, chosen for robustness on peaky/harmonic material
# (swept on the synthetic bench corpus): a LONG window (64 ms) and WIDE mel
# bands (25) integrate several harmonics per band, and a relative -60 dB
# band floor stops empty between-harmonic bands flipping to the numerical
# floor — together they cut framing/alignment noise (self-vs-shifted-self
# MCD 11.4 -> 5.6 dB) while keeping cross-content separation (~60 dB).
_MCD_FRAME = 1024
_MCD_HOP = 256
_MCD_NMELS = 25
_MCD_FLOOR_DB = 60.0


def _mfcc(wave: np.ndarray, sr: int, n_ceps: int = 13) -> np.ndarray:
    return np.asarray(mfcc(np.asarray(wave, np.float32), sr, n_ceps=n_ceps,
                           n_mels=_MCD_NMELS, frame_len=_MCD_FRAME,
                           hop=_MCD_HOP, n_fft=_MCD_FRAME,
                           floor_db=_MCD_FLOOR_DB))


def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """DTW over a frame-distance matrix -> aligned index pairs.

    Vectorised anti-diagonal sweep: every cell (i, j) on diagonal s = i + j
    depends only on diagonals s-1 (up, left) and s-2 (diag), so each
    diagonal is one numpy slice-min — T1+T2 vector passes instead of the
    O(T1*T2) pure-python double loop (corpus-scale MCD was a bench-time
    sink; same accumulation and backtrack tie-breaking as before).
    """
    t1, t2 = cost.shape
    acc = np.full((t1 + 1, t2 + 1), np.inf)
    acc[0, 0] = 0.0
    for s in range(2, t1 + t2 + 1):
        i_lo = max(1, s - t2)
        i_hi = min(t1, s - 1)
        if i_lo > i_hi:
            continue
        i = np.arange(i_lo, i_hi + 1)
        j = s - i
        best = np.minimum(acc[i - 1, j - 1],
                          np.minimum(acc[i - 1, j], acc[i, j - 1]))
        acc[i, j] = cost[i - 1, j - 1] + best
    # backtrack
    i, j = t1, t2
    path_i, path_j = [], []
    while i > 0 and j > 0:
        path_i.append(i - 1)
        path_j.append(j - 1)
        choices = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        step = int(np.argmin(choices))
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(path_i[::-1]), np.asarray(path_j[::-1])


def _speech_mask(wave: np.ndarray, n_frames: int,
                 frame_len: int = _MCD_FRAME, hop: int = _MCD_HOP,
                 floor_db: float = 40.0) -> np.ndarray:
    """(n_frames,) bool: frames whose RMS is within floor_db of the peak.

    Standard MCD practice computes over SPEECH frames only: in silences and
    stop gaps the log-mel energies sit at the numerical floor, and their
    frame-to-frame swings dominate the cepstral distance (measured: 49 dB
    held-out MCD on the stop-gap-rich round-3 corpus vs ~13 dB
    speech-only), drowning the envelope differences the metric is for."""
    n = len(wave)
    rms = np.empty(n_frames, np.float32)
    for t in range(n_frames):
        seg = wave[t * hop: min(t * hop + frame_len, n)]
        rms[t] = np.sqrt(np.mean(seg * seg)) if len(seg) else 0.0
    peak = rms.max() if n_frames else 0.0
    if peak <= 0:
        return np.zeros(n_frames, bool)
    return rms > peak * 10.0 ** (-floor_db / 20.0)


def mel_cepstral_distortion(
    synth_wave: np.ndarray, ref_wave: np.ndarray, sr: int, n_ceps: int = 13
) -> float:
    """MCD (dB) between two waveforms: speech frames only (see
    :func:`_speech_mask`), DTW-aligned, c0 (energy) excluded."""
    a = _mfcc(synth_wave, sr, n_ceps)
    b = _mfcc(ref_wave, sr, n_ceps)
    a = a[_speech_mask(np.asarray(synth_wave, np.float32), len(a))][:, 1:]
    b = b[_speech_mask(np.asarray(ref_wave, np.float32), len(b))][:, 1:]
    if len(a) < 2 or len(b) < 2:
        return float("nan")
    cost = np.sqrt(
        ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    pi, pj = dtw_path(cost)
    diff = a[pi] - b[pj]
    return float(_MCD_CONST * np.mean(np.sqrt((diff ** 2).sum(-1))))


def f0_metrics(
    synth_wave: np.ndarray, ref_wave: np.ndarray, sr: int
) -> dict:
    """Standard prosody-error trio between synthesised and reference audio:

    - ``vde``: voicing decision error — fraction of aligned frame pairs
      whose voiced/unvoiced decisions disagree.
    - ``gpe``: gross pitch error — fraction of both-voiced pairs whose f0
      deviates by more than 20%.
    - ``ffe``: f0 frame error = vde + gpe contributions (the union), the
      single-number summary used in the TTS literature.
    - ``f0_rmse_hz``: RMSE over both-voiced pairs, Hz.

    Frames are aligned with the same MFCC DTW used for MCD (synthesis
    output lengths differ from the originals), then mapped to the 10 ms
    f0 grid by frame-centre time.  The reference validated prosody by
    listening only (SURVEY.md §4); this is the objective proxy.
    """
    from snickery_tpu.features.epochs import track_f0_autocorr

    sw = np.asarray(synth_wave, np.float32)
    rw = np.asarray(ref_wave, np.float32)
    f0a, ca, _ = track_f0_autocorr(sw, sr)
    f0b, cb, _ = track_f0_autocorr(rw, sr)
    a = _mfcc(sw, sr)
    b = _mfcc(rw, sr)
    if len(a) < 2 or len(b) < 2 or not len(f0a) or not len(f0b):
        return {"vde": float("nan"), "gpe": float("nan"),
                "ffe": float("nan"), "f0_rmse_hz": float("nan")}
    cost = np.sqrt(((a[:, None, 1:] - b[None, :, 1:]) ** 2).sum(-1))
    pi, pj = dtw_path(cost)
    # MFCC frame index -> nearest f0 frame (different hops; map via the
    # frame-centre sample position)
    ia = np.searchsorted(ca, pi * _MCD_HOP + _MCD_FRAME // 2)
    ib = np.searchsorted(cb, pj * _MCD_HOP + _MCD_FRAME // 2)
    ia = np.clip(ia, 0, len(f0a) - 1)
    ib = np.clip(ib, 0, len(f0b) - 1)
    # collapse duplicate (ia, ib) pairs introduced by the hop mismatch
    pairs = np.unique(np.stack([ia, ib], axis=1), axis=0)
    va = f0a[pairs[:, 0]]
    vb = f0b[pairs[:, 1]]
    voiced_a = va > 0
    voiced_b = vb > 0
    n = len(pairs)
    vde_mask = voiced_a != voiced_b
    both = voiced_a & voiced_b
    if both.any():
        rel = np.abs(va[both] - vb[both]) / vb[both]
        gpe_mask = rel > 0.20
        f0_rmse = float(np.sqrt(np.mean((va[both] - vb[both]) ** 2)))
        gpe = float(gpe_mask.sum()) / n
    else:
        gpe, f0_rmse = float("nan"), float("nan")
        gpe_mask = np.zeros(0, bool)
    vde = float(vde_mask.sum()) / n
    ffe = vde + (gpe if np.isfinite(gpe) else 0.0)
    return {"vde": vde, "gpe": gpe, "ffe": ffe, "f0_rmse_hz": f0_rmse}


def join_discontinuity(
    wave: np.ndarray, sr: int, join_samples: np.ndarray, width: int = 256
) -> dict:
    """Spectral flux at unit joins vs within units.

    Returns dict(boundary_flux, interior_flux, ratio); a ratio near 1 means
    joins are as smooth as natural frame-to-frame evolution.
    """
    from snickery_tpu.features.stft import stft_mag

    hop = width // 2
    # stft_mag, not abs(stft(...)): fetching a complex64 array is
    # UNIMPLEMENTED on the tunnelled TPU runtime (see features/stft.py)
    spec = np.asarray(stft_mag(np.asarray(wave, np.float32), width, hop))
    if len(spec) < 3:
        return {"boundary_flux": float("nan"), "interior_flux": float("nan"),
                "ratio": float("nan")}
    flux = np.sqrt(((np.diff(spec, axis=0)) ** 2).sum(-1))
    frame_of = np.clip(np.asarray(join_samples) // hop, 1, len(flux) - 1)
    is_boundary = np.zeros(len(flux), bool)
    is_boundary[frame_of - 1] = True
    is_boundary[np.clip(frame_of, 0, len(flux) - 1)] = True
    b = float(flux[is_boundary].mean()) if is_boundary.any() else float("nan")
    i = float(flux[~is_boundary].mean()) if (~is_boundary).any() else float("nan")
    return {"boundary_flux": b, "interior_flux": i,
            "ratio": b / i if i else float("nan")}
