"""Fixed-rate framing and STFT as batched XLA ops.

Design notes (TPU-first): framing is a gather with a static (n_frames,
frame_len) index matrix — XLA lowers it to efficient dynamic-slices; the
transform is an MXU DFT matmul (features/dft.py — XLA's FFT HLO pays a
~5 min server-side plan compile per shape on this runtime). Everything is
static-shape and jit/vmap friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snickery_tpu.features.dft import irdft, rdft


def hann(length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches np.hanning's symmetric variant when
    length is what the reference's taper uses; for OLA-COLA we use periodic)."""
    n = jnp.arange(length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / length)


def hann_symmetric(length: int, dtype=jnp.float32) -> jax.Array:
    """Symmetric Hann (np.hanning) — used for unit tapers, matching the
    reference's taper construction (SURVEY.md §2 row 5)."""
    if length == 1:
        return jnp.ones((1,), dtype)
    n = jnp.arange(length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / (length - 1))


def frame_signal(wave: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """Slice *wave* (n,) into overlapping frames -> (n_frames, frame_len).

    Pads the tail with zeros so every sample is covered.
    """
    n = wave.shape[0]
    n_frames = max(1, int(np.ceil(max(n - frame_len, 0) / hop)) + 1)
    pad_to = (n_frames - 1) * hop + frame_len
    wave = jnp.pad(wave, (0, pad_to - n))
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :])
    return wave[idx]


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "n_fft"))
def stft(wave: jax.Array, frame_len: int, hop: int, n_fft: int | None = None) -> jax.Array:
    """STFT -> complex (n_frames, n_fft//2 + 1).

    NOTE (TPU runtime): complex64 arrays cannot cross the host<->device
    boundary on the tunnelled TPU runtime used here (UNIMPLEMENTED at
    transfer, and the client wedges afterwards) — complex is fine INSIDE a
    jitted program but must not be an input or fetched output.  Call this
    from within a larger jit whose outputs are real (log_mel_spectrogram,
    magphase_analysis_frames), or use :func:`stft_mag` when only the
    magnitude is needed host-side.
    """
    n_fft = n_fft or frame_len
    frames = frame_signal(wave, frame_len, hop) * hann(frame_len, wave.dtype)
    # MXU DFT matmul, not jnp.fft.rfft: the FFT HLO's first execution pays a
    # ~5 min server-side plan compile per shape on this runtime (dft.py)
    re, im = rdft(frames, n_fft)
    return re + 1j * im


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "n_fft"))
def stft_mag(wave: jax.Array, frame_len: int, hop: int,
             n_fft: int | None = None) -> jax.Array:
    """|STFT| -> float32 (n_frames, n_fft//2 + 1).

    One jitted program whose complex intermediates never materialise on the
    host — the TPU-safe entry point for magnitude spectra (see the note on
    :func:`stft`)."""
    return jnp.abs(stft(wave, frame_len, hop, n_fft))


@functools.partial(jax.jit, static_argnames=("frame_len", "hop", "n_samples"))
def istft(spec: jax.Array, frame_len: int, hop: int, n_samples: int) -> jax.Array:
    """Inverse STFT with Hann-squared COLA normalisation -> (n_samples,)."""
    frames = irdft(jnp.real(spec), jnp.imag(spec), frame_len)
    win = hann(frame_len, frames.dtype)
    frames = frames * win
    n_frames = frames.shape[0]
    out_len = (n_frames - 1) * hop + frame_len
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]).reshape(-1)
    out = jnp.zeros((out_len,), frames.dtype).at[idx].add(frames.reshape(-1))
    norm = jnp.zeros((out_len,), frames.dtype).at[idx].add(
        jnp.broadcast_to(win * win, (n_frames, frame_len)).reshape(-1)
    )
    out = out / jnp.maximum(norm, 1e-8)
    return out[:n_samples] if out_len >= n_samples else jnp.pad(out, (0, n_samples - out_len))
