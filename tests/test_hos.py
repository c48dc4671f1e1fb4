"""HOS (maximum kurtosis / negentropy) beamformer tests."""

import numpy as np
import pytest

import distant_speech_recognition_tpu.models.beamforming as bf
import distant_speech_recognition_tpu.models.hos as hos
from distant_speech_recognition_tpu.utils import geometry

FFTLEN = 16
FS = 16000.0
F = FFTLEN // 2 + 1
C = 4


def _setup(rng, T=400):
    """Super-Gaussian target from look direction + Gaussian interferer."""
    delays_t = geometry.calc_la_delays(np.arange(C)[:, None] * 50.0, azimuth=0.7)
    delays_j = geometry.calc_la_delays(np.arange(C)[:, None] * 50.0, azimuth=2.2)
    vs_t = np.asarray(bf.array_manifold(FFTLEN, FS, delays_t))
    vs_j = np.asarray(bf.array_manifold(FFTLEN, FS, delays_j))

    # Laplacian-like (super-Gaussian) target, Gaussian jammer
    s = rng.laplace(size=(T, F)) * np.exp(1j * rng.uniform(0, 2 * np.pi, (T, F)))
    n = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))) * 1.5
    X = (vs_t[None] * C * s[..., None] + vs_j[None] * C * n[..., None]).astype(np.complex64)

    wuH = np.conj(vs_t)[None].astype(np.complex64)  # [S=1, F, C] D&S upper branch
    BmH = np.asarray(bf.blocking_matrix(vs_t, 1)).swapaxes(-1, -2)[None].astype(np.complex64)
    return X, wuH, BmH, s


def test_gsc_outputs_matches_reference_form(rng):
    X, wuH, BmH, _ = _setup(rng, T=20)
    waH = (rng.standard_normal((1, F, C - 1)) + 1j * rng.standard_normal((1, F, C - 1))).astype(np.complex64) * 0.1
    Y = np.asarray(hos.gsc_outputs(waH, X, wuH, BmH))
    # golden loop (calc_gsc_output_f, pybeamformer.py:1472-1487)
    for t in range(3):
        for f in range(F):
            woH = wuH[0, f] - np.conj(waH[0, f]) @ BmH[0, f]
            want = woH @ X[t, f]
            np.testing.assert_allclose(Y[t, f, 0], want, atol=1e-4)


def test_mek_improves_kurtosis_and_suppresses_jammer(rng):
    X, wuH, BmH, s = _setup(rng)
    cfg = hos.HOSConfig(alpha=0.01, beta=3.0, iterations=150, learning_rate=0.05)
    waH = np.asarray(hos.estimate_mek_weights(X, wuH, BmH, cfg))

    Y0 = np.asarray(hos.gsc_outputs(np.zeros_like(waH), X, wuH, BmH))[..., 0]
    Y1 = np.asarray(hos.gsc_outputs(waH, X, wuH, BmH))[..., 0]

    def kurt(Y):
        Y2 = np.abs(Y) ** 2
        return (Y2**2).mean(0) - 3 * (Y2.mean(0)) ** 2

    # kurtosis increases on average across bins
    assert kurt(Y1).mean() > kurt(Y0).mean()
    # output closer to the super-Gaussian target than the quiescent output
    err0 = np.abs(Y0 - s).mean()
    err1 = np.abs(Y1 - s).mean()
    assert err1 < err0, (err0, err1)


def test_mn_weights_run_and_are_finite(rng):
    X, wuH, BmH, _ = _setup(rng, T=150)
    cfg = hos.HOSConfig(iterations=50, learning_rate=0.05, ggd_shape=0.5)
    waH = np.asarray(hos.estimate_mn_weights(X, wuH, BmH, cfg))
    assert waH.shape == (1, F, C - 1)
    assert np.isfinite(waH).all()
    out = np.asarray(hos.apply_hos_weights(waH, X, wuH, BmH))
    assert np.isfinite(out).all()
