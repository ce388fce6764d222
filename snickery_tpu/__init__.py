"""snickery_tpu — TPU-native hybrid unit-selection speech synthesis.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
CSTR-Edinburgh/snickery research codebase (hybrid unit-selection waveform
synthesis with epoch-sized and halfphone units):

- voice building: wav + pitchmarks (+ HTS labels) -> unit database artifact
  (``snickery_tpu.voicedb``), replacing the reference's HDF5 voice DB
  (reference: script/train_halfphone.py — unverified, mount empty; see SURVEY.md).
- synthesis: target trajectory -> brute-force fused top-k preselection over the
  (optionally multi-chip-sharded) unit DB -> target+join-cost Viterbi compiled
  as a ``lax.scan`` -> epoch-synchronous overlap-add concatenation
  (reference: script/synth_halfphone.py, class Synthesiser).
- features: batched XLA FFT/filterbank acoustic analysis (magphase-style
  mag/real/imag/lf0 streams, MFCC) replacing the external MagPhase/WORLD tools.
- parallel: ``jax.sharding`` mesh (data x db) with per-shard top-k + all-gather,
  replacing nothing in the reference (it is single-process CPU) but required by
  the north star (BASELINE.json).

Public API:
    from snickery_tpu import Synthesiser, train_voice, load_config
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SNICKERY_PLATFORM"):
    # Honour SNICKERY_PLATFORM=cpu|tpu BEFORE any backend is instantiated:
    # lets the CLIs run host-side (debugging, or while a TPU job owns the
    # chip) without touching JAX_PLATFORMS, which hosted environments may
    # pre-set and pre-import (a late env-var write is ignored — the config
    # API is the only reliable override; same trick as tests/conftest.py).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SNICKERY_PLATFORM"])

from snickery_tpu.config import SnickeryConfig, load_config

__all__ = [
    "SnickeryConfig",
    "load_config",
    "Synthesiser",
    "train_voice",
    "__version__",
]


def __getattr__(name):
    # Lazy imports keep `import snickery_tpu` light (jax/XLA init deferred
    # until the compute path is actually used).
    if name == "Synthesiser":
        from snickery_tpu.synth import Synthesiser
        return Synthesiser
    if name == "train_voice":
        from snickery_tpu.train import train_voice
        return train_voice
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
