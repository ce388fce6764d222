"""Magphase-style pitch-synchronous analysis/resynthesis in pure JAX.

The reference uses the external MagPhase vocoder (L0 tool, SURVEY.md §1) to
produce epoch-synchronous ``mag`` / ``real`` / ``imag`` / ``lf0`` streams and
to resynthesise audio from selected units.  This module is a TPU-native
equivalent of that *interface*: same four streams, same epoch-synchronous
frame rate, analysis and synthesis both batched static-shape XLA programs.
It is not bit-compatible with MagPhase (which could not be consulted — the
reference mount is empty; see SURVEY.md provenance warning).

Parameterisation:
- frame i covers two local pitch periods around epoch t_i, asymmetrically
  Hann-windowed (rising over [t_{i-1}, t_i], falling over [t_i, t_{i+1}]);
- ``mag``  = mel-warped log magnitude spectrum (n_mag dims);
- ``real``/``imag`` = mel-warped cos/sin of the unwrapped-phase-free spectrum
  (X normalised by |X|), capturing phase structure compactly;
- ``lf0``  = log f0 from the epoch grid (voiced/unvoiced aware).

All per-epoch work is expressed as a gather + elementwise window + rfft +
filterbank matmul, vmapped over epochs: static shapes, MXU-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snickery_tpu.features.dft import irdft, rdft
from snickery_tpu.features.mel import mel_filterbank


def _warp_matrix(n_bins: int, n_out: int, sample_rate: int) -> np.ndarray:
    """Row-normalised mel warp (n_bins, n_out): averages FFT bins per band."""
    fb = mel_filterbank(n_out, (n_bins - 1) * 2, sample_rate).copy()
    col = fb.sum(axis=0, keepdims=True)
    return (fb / np.maximum(col, 1e-8)).astype(np.float32)


def _unwarp_matrix(n_bins: int, n_out: int, sample_rate: int) -> np.ndarray:
    """Pseudo-inverse warp (n_out, n_bins): spreads band values back to bins."""
    fb = mel_filterbank(n_out, (n_bins - 1) * 2, sample_rate).copy()
    row = fb.sum(axis=1, keepdims=True)
    return (fb / np.maximum(row, 1e-8)).T.astype(np.float32)


def _epoch_frames(
    wave: jax.Array,
    epochs: jax.Array,
    prev_gap: jax.Array,
    next_gap: jax.Array,
    frame_max: int,
) -> tuple[jax.Array, jax.Array]:
    """Gather two-period frames centred at each epoch with asymmetric Hann.

    Returns (frames (E, frame_max), window (E, frame_max)); frames are
    already windowed and masked.
    """
    half = frame_max // 2
    n = wave.shape[0]
    offs = jnp.arange(frame_max, dtype=jnp.int32) - half          # (F,)
    idx = epochs[:, None] + offs[None, :]                          # (E, F)
    valid = (idx >= 0) & (idx < n)
    gathered = wave[jnp.clip(idx, 0, n - 1)]
    # asymmetric Hann: rising half-cosine over prev_gap, falling over next_gap
    rel = offs[None, :].astype(jnp.float32)                        # (1, F)
    pg = jnp.maximum(prev_gap[:, None].astype(jnp.float32), 1.0)
    ng = jnp.maximum(next_gap[:, None].astype(jnp.float32), 1.0)
    left = 0.5 + 0.5 * jnp.cos(jnp.pi * jnp.clip(-rel / pg, 0.0, 1.0))
    right = 0.5 + 0.5 * jnp.cos(jnp.pi * jnp.clip(rel / ng, 0.0, 1.0))
    win = jnp.where(rel < 0, left, right) * valid.astype(jnp.float32)
    return gathered * win, win


@functools.partial(
    jax.jit,
    static_argnames=("frame_max", "n_fft", "n_mag", "n_phase", "sample_rate"),
)
def magphase_analysis_frames(
    wave: jax.Array,
    epochs: jax.Array,
    frame_max: int,
    n_fft: int,
    n_mag: int,
    n_phase: int,
    sample_rate: int,
) -> dict[str, jax.Array]:
    """Core batched analysis: epoch positions -> mag/real/imag streams."""
    e = epochs.astype(jnp.int32)
    prev_gap = jnp.diff(e, prepend=e[:1] - (e[1:2] - e[:1] if e.shape[0] > 1 else 64))
    next_gap = jnp.diff(e, append=e[-1:] + (e[-1:] - e[-2:-1] if e.shape[0] > 1 else 64))
    prev_gap = jnp.maximum(prev_gap, 1)
    next_gap = jnp.maximum(next_gap, 1)
    frames, _ = _epoch_frames(wave, e, prev_gap, next_gap, frame_max)
    # Rotate the frame so the epoch sits at sample 0: removes the linear
    # phase ramp, leaving a slowly-varying phase spectrum that survives
    # mel-band averaging of its cos/sin. (Synthesis applies the inverse
    # rotation via fftshift after the irfft.)
    frames = jnp.fft.ifftshift(
        jnp.pad(frames, ((0, 0), ((n_fft - frame_max) // 2, (n_fft - frame_max) // 2))),
        axes=-1,
    )
    # MXU DFT matmul, NOT jnp.fft.rfft: the FFT HLO's first execution pays
    # a ~313 s server-side plan compile per shape on this runtime (see
    # features/dft.py) while the matmul compiles+runs in seconds.
    spec_re, spec_im = rdft(frames, n_fft)                         # (E, n_bins)
    magnitude = jnp.sqrt(spec_re * spec_re + spec_im * spec_im)
    n_bins = n_fft // 2 + 1
    warp_mag = jnp.asarray(_warp_matrix(n_bins, n_mag, sample_rate))
    warp_ph = jnp.asarray(_warp_matrix(n_bins, n_phase, sample_rate))
    mag = jnp.log(jnp.maximum(
        jnp.dot(magnitude, warp_mag, preferred_element_type=jnp.float32), 1e-8))
    inv_mag = 1.0 / jnp.maximum(magnitude, 1e-8)
    real = jnp.dot(spec_re * inv_mag, warp_ph,
                   preferred_element_type=jnp.float32)
    imag = jnp.dot(spec_im * inv_mag, warp_ph,
                   preferred_element_type=jnp.float32)
    return {"mag": mag, "real": real, "imag": imag}


def magphase_analysis(
    wave: np.ndarray,
    epoch_samples: np.ndarray,
    sample_rate: int,
    n_mag: int = 60,
    n_phase: int = 45,
    fmin: float = 50.0,
    n_fft: int | None = None,
) -> dict[str, np.ndarray]:
    """Full analysis: wave + epochs -> {mag, real, imag, lf0} numpy streams."""
    from snickery_tpu.features.epochs import f0_from_epochs

    epoch_samples = np.asarray(epoch_samples, dtype=np.int32)
    if len(epoch_samples) == 0:
        return {
            "mag": np.zeros((0, n_mag), np.float32),
            "real": np.zeros((0, n_phase), np.float32),
            "imag": np.zeros((0, n_phase), np.float32),
            "lf0": np.zeros((0, 1), np.float32),
        }
    frame_max = int(2 ** np.ceil(np.log2(2 * sample_rate / fmin)))
    n_fft = n_fft or frame_max
    # Bucket the epoch axis (pad by repeating the last epoch) so utterances
    # with different epoch counts share one compiled program — TPU compiles
    # here are expensive (remote-compile path) and E varies per utterance.
    E = len(epoch_samples)
    Ep = max(128, ((E + 127) // 128) * 128)
    eps_padded = np.concatenate([epoch_samples, np.full(Ep - E, epoch_samples[-1], np.int32)])
    # Wave length also varies; bucket it too (zero-pad; frames are masked).
    n = len(wave)
    npad = max(1024, ((n + 16383) // 16384) * 16384)
    wave_padded = np.concatenate([np.asarray(wave, np.float32), np.zeros(npad - n, np.float32)])
    out = magphase_analysis_frames(
        jnp.asarray(wave_padded), jnp.asarray(eps_padded),
        frame_max=frame_max, n_fft=n_fft, n_mag=n_mag, n_phase=n_phase,
        sample_rate=sample_rate,
    )
    result = {k: np.asarray(v)[:E] for k, v in out.items()}
    result["lf0"] = f0_from_epochs(epoch_samples, sample_rate, fmin=fmin)
    return result


@functools.partial(
    jax.jit,
    static_argnames=("frame_max", "n_fft", "n_samples", "sample_rate",
                     "wsum_floor", "overlap"),
)
def magphase_synthesis_frames(
    mag: jax.Array,
    real: jax.Array,
    imag: jax.Array,
    epochs: jax.Array,
    frame_max: int,
    n_fft: int,
    n_samples: int,
    sample_rate: int,
    wsum_floor: float = 0.3,
    overlap: int = 0,
) -> jax.Array:
    """Resynthesise: streams + target epoch grid -> waveform (n_samples,).

    Spectra are un-warped to full resolution, recombined into complex form,
    inverse-FFT'd, windowed over the *target* epoch gaps, and overlap-added
    at the target epoch positions (scatter-add).
    """
    n_bins = n_fft // 2 + 1
    unwarp_mag = jnp.asarray(_unwarp_matrix(n_bins, mag.shape[-1], sample_rate))
    unwarp_ph = jnp.asarray(_unwarp_matrix(n_bins, real.shape[-1], sample_rate))
    magnitude = jnp.exp(jnp.dot(mag, unwarp_mag, preferred_element_type=jnp.float32))
    re = jnp.dot(real, unwarp_ph, preferred_element_type=jnp.float32)
    im = jnp.dot(imag, unwarp_ph, preferred_element_type=jnp.float32)
    norm = jnp.sqrt(jnp.maximum(re * re + im * im, 1e-8))
    scale = magnitude / norm
    # MXU inverse DFT, NOT jnp.fft.irfft (same first-execution pathology as
    # the forward FFT — see features/dft.py)
    frames = irdft(re * scale, im * scale, n_fft)                  # (E, n_fft)
    frames = jnp.fft.fftshift(frames, axes=-1)[:, n_fft // 2 - frame_max // 2:
                                               n_fft // 2 + frame_max // 2]
    e = epochs.astype(jnp.int32)
    prev_gap = jnp.maximum(jnp.diff(e, prepend=e[:1] - 64), 1)
    next_gap = jnp.maximum(jnp.diff(e, append=e[-1:] + 64), 1)
    half = frame_max // 2
    offs = jnp.arange(frame_max, dtype=jnp.int32) - half
    rel = offs[None, :].astype(jnp.float32)
    # config magphase_overlap: each frame's window support widens by
    # `overlap` extra pitch periods per side (smoother joins, softer
    # transients); the wsum normalisation keeps amplitude calibrated
    pg = prev_gap[:, None].astype(jnp.float32) * (1 + overlap)
    ng = next_gap[:, None].astype(jnp.float32) * (1 + overlap)
    left = 0.5 + 0.5 * jnp.cos(jnp.pi * jnp.clip(-rel / pg, 0.0, 1.0))
    right = 0.5 + 0.5 * jnp.cos(jnp.pi * jnp.clip(rel / ng, 0.0, 1.0))
    win = jnp.where(rel < 0, left, right)
    idx = e[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < n_samples)
    contrib = frames * win * valid.astype(jnp.float32)
    out = jnp.zeros((n_samples,), jnp.float32).at[
        jnp.clip(idx, 0, n_samples - 1).reshape(-1)
    ].add(contrib.reshape(-1))
    wsum = jnp.zeros((n_samples,), jnp.float32).at[
        jnp.clip(idx, 0, n_samples - 1).reshape(-1)
    ].add((win * valid.astype(jnp.float32)).reshape(-1))
    # wsum_floor guards against amplification where window coverage is thin
    # (utterance edges, coarse epoch grids): positions whose summed window
    # weight falls below the floor are attenuated rather than boosted.  A
    # design constant (reference unavailable — SURVEY.md provenance note),
    # exposed as a parameter so voices can re-tune it.
    return out / jnp.maximum(wsum, wsum_floor)


def magphase_synthesis(
    streams: dict[str, np.ndarray],
    sample_rate: int,
    target_lf0: np.ndarray | None = None,
    fmin: float = 50.0,
    n_samples: int | None = None,
    epoch_samples: np.ndarray | None = None,
    wsum_floor: float = 0.3,
    overlap: int = 0,
) -> np.ndarray:
    """Resynthesise a waveform from {mag, real, imag, lf0} streams.

    The epoch grid is ``epoch_samples`` when given (copy-synthesis with the
    natural grid), else integrated from lf0 (``magphase_use_target_f0``: pass
    ``target_lf0`` to impose the target's f0 contour on the selected units'
    spectra — reference config key per SURVEY.md §5.6 [M]).
    """
    if epoch_samples is not None:
        epochs = np.asarray(epoch_samples, dtype=np.int64)
        n_frames = len(epochs)
        if n_frames == 0:
            return np.zeros(0, np.float32)
        periods = np.diff(epochs, append=epochs[-1:] + 64).astype(np.float64)
    else:
        lf0 = np.asarray(target_lf0 if target_lf0 is not None else streams["lf0"])
        lf0 = lf0.reshape(-1)
        n_frames = len(lf0)
        if n_frames == 0:
            return np.zeros(0, np.float32)
        periods = sample_rate / np.maximum(np.exp(lf0), 1e-3)
        periods = np.clip(periods, 2, 2 * sample_rate / fmin)
        epochs = np.cumsum(periods).astype(np.int64)
    total = int(epochs[-1] + periods[-1]) if n_samples is None else n_samples
    frame_max = int(2 ** np.ceil(np.log2(2 * sample_rate / fmin)))
    wave = magphase_synthesis_frames(
        jnp.asarray(streams["mag"], jnp.float32),
        jnp.asarray(streams["real"], jnp.float32),
        jnp.asarray(streams["imag"], jnp.float32),
        jnp.asarray(epochs, jnp.int32),
        frame_max=frame_max, n_fft=frame_max, n_samples=total,
        sample_rate=sample_rate, wsum_floor=wsum_floor, overlap=overlap,
    )
    return np.asarray(wave)
