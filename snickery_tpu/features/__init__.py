"""Acoustic feature extraction — batched XLA FFT/filterbank ops.

Replaces the reference's L0 external tools (MagPhase vocoder repo, WORLD,
REAPER — SURVEY.md §1 L0/L2) with native JAX implementations:

- ``stft``:     fixed-rate framing + windowed rfft/irfft
- ``mel``:      mel filterbank, MFCC (matmul-friendly, MXU-sized)
- ``magphase``: magphase-style pitch-synchronous mag/real/imag/lf0 analysis
                and resynthesis
- ``epochs``:   pitch epoch (GCI) detection + f0 tracking (REAPER fallback)
"""

from snickery_tpu.features.stft import frame_signal, stft, stft_mag, istft, hann
from snickery_tpu.features.mel import mel_filterbank, mfcc, log_mel_spectrogram
from snickery_tpu.features.magphase import (
    magphase_analysis,
    magphase_synthesis,
)
from snickery_tpu.features.epochs import (
    detect_epochs, detect_epochs_batch, f0_from_epochs)
from snickery_tpu.features.smoothing import smooth_joins

__all__ = [
    "frame_signal", "stft", "stft_mag", "istft", "hann",
    "mel_filterbank", "mfcc", "log_mel_spectrogram",
    "magphase_analysis", "magphase_synthesis",
    "detect_epochs", "detect_epochs_batch", "f0_from_epochs",
    "smooth_joins",
]
