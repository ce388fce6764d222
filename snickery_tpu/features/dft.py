"""Real DFT / inverse real DFT as MXU matmuls — the TPU-native FFT.

Why not ``jnp.fft.rfft``: XLA's FFT HLO is correct on this runtime but its
FIRST execution pays a server-side compile of the FFT plan that measured
**313 s** at the analysis shape (78848, 1024) on the tunnelled v5e — per
distinct shape, per process, and the persistent JAX compilation cache
cannot help because the cost is inside the remote runtime, not the client
compile (measured: client cache HIT + 269 s first call; second call 4.5 s).
That single op dominated the wall clock of every corpus analysis.

A dense DFT matmul is the TPU-first design anyway: at the shapes this
codebase uses (frame_len ≤ 2048, thousands of frames) the transform is a
(E, N) × (N, N/2+1) matmul — ~100 GFLOP at the bench corpus, microseconds
of MXU time — that compiles like any other dot and rides the existing
fast-compile path.  ``precision=HIGHEST`` keeps f32 accumulation exact to
~1e-5 relative, measured against np.fft on the analysis frames (the
features feed log-magnitude + unit-phase streams; the end-to-end effect is
below every gate's resolution).

The cos/sin matrices are generated INSIDE the jitted graph from iota (an
(N, N/2+1) elementwise cos/sin — sub-millisecond), so no multi-MB constant
is baked into the executable or the persistent cache entry.

Reference parity: the reference's MagPhase vocoder runs numpy FFTs on the
host (SURVEY.md §1 L0); this module is the device-side equivalent of that
transform layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _angles(n_fft: int, dtype=jnp.float32) -> jax.Array:
    """(n_fft, n_bins) matrix of 2π·k·n/N angles, built in-graph."""
    n_bins = n_fft // 2 + 1
    n = jnp.arange(n_fft, dtype=jnp.float32)[:, None]
    k = jnp.arange(n_bins, dtype=jnp.float32)[None, :]
    return (2.0 * jnp.pi / n_fft) * n * k


def rdft(frames: jax.Array, n_fft: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Real DFT of the last axis -> (re, im), each (..., n_fft//2 + 1).

    Matches ``jnp.fft.rfft(frames, n=n_fft)``: ``re + 1j*im`` equals the
    rfft output to f32-matmul accuracy.  Zero-pads (or truncates) the last
    axis to *n_fft* like rfft's ``n=`` argument.
    """
    n = frames.shape[-1]
    n_fft = n_fft or n
    if n_fft > n:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - n)]
        frames = jnp.pad(frames, pad)
    elif n_fft < n:
        frames = frames[..., :n_fft]
    ang = _angles(n_fft, frames.dtype)
    cos_m = jnp.cos(ang)
    sin_m = jnp.sin(ang)
    re = jnp.dot(frames, cos_m, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    im = -jnp.dot(frames, sin_m, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    return re, im


def irdft(re: jax.Array, im: jax.Array, n_fft: int) -> jax.Array:
    """Inverse of :func:`rdft` -> (..., n_fft) real frames.

    Matches ``jnp.fft.irfft(re + 1j*im, n=n_fft)``: conjugate-symmetric
    expansion folded into per-bin weights (1 for DC/Nyquist, 2 interior).
    """
    n_bins = n_fft // 2 + 1
    assert re.shape[-1] == n_bins, (re.shape, n_fft)
    ang = _angles(n_fft, re.dtype)                      # (n_fft, n_bins)
    w = jnp.full((n_bins,), 2.0, re.dtype).at[0].set(1.0).at[-1].set(1.0)
    cos_m = (jnp.cos(ang) * w[None, :] / n_fft).T       # (n_bins, n_fft)
    sin_m = (jnp.sin(ang) * w[None, :] / n_fft).T
    return (jnp.dot(re, cos_m, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            - jnp.dot(im, sin_m, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32))
