"""ops/dft.py: DFT-as-matmul kernels vs the jnp.fft reference formulas."""

import numpy as np
import pytest

import jax.numpy as jnp

from distant_speech_recognition_tpu.ops import dft


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("M", [8, 64, 256])
def test_analysis_dft_matches_reversed_ifft(M, rng):
    """analysis_dft(w) == M * ifft(w[::-1]) — the reference's backward DFT of
    the time-reversed FIR output (modulated.cc:384-397)."""
    w = rng.standard_normal((5, M)).astype(np.float32)
    got = np.asarray(dft.analysis_dft(jnp.asarray(w), M))
    want = M * np.fft.ifft(w[..., ::-1], axis=-1)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


@pytest.mark.parametrize("M", [8, 64, 256])
def test_analysis_dft_half_is_lower_band(M, rng):
    w = rng.standard_normal((5, M)).astype(np.float32)
    full = np.asarray(dft.analysis_dft(jnp.asarray(w), M))
    half = np.asarray(dft.analysis_dft_half(jnp.asarray(w), M))
    np.testing.assert_allclose(half, full[..., : M // 2 + 1], rtol=0,
                               atol=2e-4 * np.abs(full).max())


@pytest.mark.parametrize("M", [8, 64, 256])
def test_synthesis_dft_half_matches_mirrored_fft(M, rng):
    """synthesis_dft_half(Y) == Re(fft(hermitian_mirror(Y))) — the synthesis
    pre-image of modulated.cc:556-563."""
    from distant_speech_recognition_tpu.ops.filterbank import hermitian_mirror

    F = M // 2 + 1
    Y = (rng.standard_normal((5, F)) + 1j * rng.standard_normal((5, F))).astype(np.complex64)
    got = np.asarray(dft.synthesis_dft_half(jnp.asarray(Y), M))
    want = np.real(np.fft.fft(np.asarray(hermitian_mirror(jnp.asarray(Y), M)), axis=-1))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


@pytest.mark.parametrize("M", [8, 256])
def test_synthesis_dft_matches_re_fft(M, rng):
    Y = (rng.standard_normal((5, M)) + 1j * rng.standard_normal((5, M))).astype(np.complex64)
    got = np.asarray(dft.synthesis_dft(jnp.asarray(Y), M))
    want = np.real(np.fft.fft(Y, axis=-1))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(want).max())


def test_fft_fallback_above_threshold(rng, monkeypatch):
    """Above MATMUL_MAX_M the twiddled-fft fallback produces the same values."""
    M = 64
    w = rng.standard_normal((3, M)).astype(np.float32)
    F = M // 2 + 1
    Y = (rng.standard_normal((3, F)) + 1j * rng.standard_normal((3, F))).astype(np.complex64)
    Yfull = np.concatenate([Y, np.conj(Y[..., -2:0:-1])], axis=-1)

    def run_all():
        return (
            np.asarray(dft.analysis_dft(jnp.asarray(w), M)),
            np.asarray(dft.analysis_dft_half(jnp.asarray(w), M)),
            np.asarray(dft.synthesis_dft_half(jnp.asarray(Y), M)),
            np.asarray(dft.synthesis_dft(jnp.asarray(Yfull), M)),
        )

    via_mm = run_all()
    monkeypatch.setattr(dft, "MATMUL_MAX_M", 0)
    via_fft = run_all()
    for a, b in zip(via_mm, via_fft):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * max(np.abs(b).max(), 1.0))


def test_filterbank_matmul_and_fft_paths_agree(rng, monkeypatch):
    """analysis/analysis_half give the same subbands through the block-parity
    matmul path and the _polyphase_w + fft fallback."""
    from distant_speech_recognition_tpu.ops import filterbank as fbk

    p = fbk.FilterbankParams(M=16, m=4, r=2, delay_compensation_type=2)
    h = rng.standard_normal(p.N).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 400)).astype(np.float32)
    mm_full = np.asarray(fbk.analysis(jnp.asarray(x), jnp.asarray(h), p))
    mm_half = np.asarray(fbk.analysis_half(jnp.asarray(x), jnp.asarray(h), p))
    monkeypatch.setattr(dft, "MATMUL_MAX_M", 0)
    fft_full = np.asarray(fbk.analysis(jnp.asarray(x), jnp.asarray(h), p))
    fft_half = np.asarray(fbk.analysis_half(jnp.asarray(x), jnp.asarray(h), p))
    scale = np.abs(fft_full).max()
    np.testing.assert_allclose(mm_full, fft_full, rtol=0, atol=2e-4 * scale)
    np.testing.assert_allclose(mm_half, fft_half, rtol=0, atol=2e-4 * scale)
