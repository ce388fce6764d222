"""MXU DFT-matmul vs numpy FFT: the replacement must be numerically
transparent (features/dft.py replaced jnp.fft.rfft/irfft after the FFT
HLO's ~313 s first-execution plan compile was measured on the TPU runtime;
see the module docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from snickery_tpu.features.dft import irdft, rdft


@pytest.mark.parametrize("n_fft", [128, 1024, 2048])
def test_rdft_matches_numpy_rfft(n_fft):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((16, n_fft)).astype(np.float32)
    re, im = rdft(jnp.asarray(x))
    ref = np.fft.rfft(x, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-4 * scale)


@pytest.mark.parametrize("n_fft", [128, 1024])
def test_irdft_roundtrip(n_fft):
    rng = np.random.default_rng(11)
    x = rng.standard_normal((8, n_fft)).astype(np.float32)
    re, im = rdft(jnp.asarray(x))
    back = np.asarray(irdft(re, im, n_fft))
    np.testing.assert_allclose(back, x, atol=5e-5 * np.abs(x).max() * n_fft ** 0.5)


def test_irdft_matches_numpy_irfft():
    n_fft = 1024
    rng = np.random.default_rng(3)
    spec = (rng.standard_normal((8, n_fft // 2 + 1))
            + 1j * rng.standard_normal((8, n_fft // 2 + 1))).astype(np.complex64)
    out = np.asarray(irdft(jnp.asarray(spec.real), jnp.asarray(spec.imag), n_fft))
    ref = np.fft.irfft(spec, n=n_fft, axis=-1)
    np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(ref).max() + 1e-6)


def test_rdft_pad_and_truncate_match_rfft_n_arg():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 300)).astype(np.float32)
    for n in (512, 256):
        re, im = rdft(jnp.asarray(x), n)
        ref = np.fft.rfft(x, n=n, axis=-1)
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-4 * scale)
