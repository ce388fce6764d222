"""Mel filterbank, log-mel spectrogram, MFCC — as MXU-friendly matmuls.

The filterbank and DCT are precomputed dense matrices so the whole feature
pipeline is (frames x bins) @ (bins x mels) @ (mels x ceps): pure matmul work
that XLA tiles onto the MXU (north star: "MFCC/WORLD/magphase streams ->
batched XLA FFT+filterbank").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snickery_tpu.features.stft import stft


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    n_mels: int,
    n_fft: int,
    sample_rate: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank -> (n_fft//2+1, n_mels) float32 matrix."""
    fmax = fmax or sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bin_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    fb = np.zeros((n_bins, n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_freqs - lo) / max(ctr - lo, 1e-8)
        down = (hi - bin_freqs) / max(hi - ctr, 1e-8)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    # Slaney-style area normalisation keeps levels comparable across bands.
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    fb *= enorm[None, :].astype(np.float32)
    return fb


@functools.lru_cache(maxsize=32)
def dct_matrix(n_mels: int, n_ceps: int) -> np.ndarray:
    """Orthonormal DCT-II -> (n_mels, n_ceps) float32 matrix."""
    k = np.arange(n_ceps)[None, :]
    n = np.arange(n_mels)[:, None]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels))
    mat *= np.sqrt(2.0 / n_mels)
    mat[:, 0] *= np.sqrt(0.5)
    return mat.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels", "frame_len", "hop",
                                             "n_fft", "sample_rate",
                                             "floor_db"))
def log_mel_spectrogram(
    wave: jax.Array,
    sample_rate: int,
    n_mels: int = 80,
    frame_len: int = 400,
    hop: int = 160,
    n_fft: int = 512,
    floor_db: float | None = None,
) -> jax.Array:
    """(n_frames, n_mels) log-mel energies.

    ``floor_db``: clamp band energies at ``max(mel) * 10^(-floor_db/10)``
    (a RELATIVE floor) instead of the absolute 1e-10.  Evaluation metrics
    need this: on peaky/harmonic material, bands between harmonics sit at
    the numerical floor and flip by tens of nats as harmonics cross band
    edges, drowning real envelope differences (see evaluate.py)."""
    spec = stft(wave, frame_len, hop, n_fft)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    floor = (jnp.float32(1e-10) if floor_db is None
             else jnp.maximum(jnp.max(mel) * 10.0 ** (-floor_db / 10.0), 1e-30))
    return jnp.log(jnp.maximum(mel, floor))


@functools.partial(jax.jit, static_argnames=(
    "n_ceps", "n_mels", "frame_len", "hop", "n_fft", "sample_rate",
    "floor_db"))
def mfcc(
    wave: jax.Array,
    sample_rate: int,
    n_ceps: int = 13,
    n_mels: int = 40,
    frame_len: int = 400,
    hop: int = 160,
    n_fft: int = 512,
    floor_db: float | None = None,
) -> jax.Array:
    """(n_frames, n_ceps) MFCCs (``floor_db``: see log_mel_spectrogram)."""
    logmel = log_mel_spectrogram(wave, sample_rate, n_mels, frame_len, hop,
                                 n_fft, floor_db)
    dct = jnp.asarray(dct_matrix(n_mels, n_ceps))
    return jnp.dot(logmel, dct, preferred_element_type=jnp.float32)
