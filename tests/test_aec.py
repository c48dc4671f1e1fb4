"""AEC equivalence tests against per-bin goldens + functional echo tests."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import aec

F, T = 9, 60


def _streams(rng, echo_gain=0.8):
    V = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64) * 20
    near = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)
    A = (echo_gain * np.exp(1j * 0.3) * V + near).astype(np.complex64)
    return V, A, near


def _golden_nlms(V, A, delta, epsilon, threshold):
    R = np.zeros(F, complex)
    E = np.zeros((T, F), complex)
    for t in range(T):
        for k in range(F):
            Vk, Ak = V[t, k], A[t, k]
            E[t, k] = Ak - R[k] * Vk
            if abs(Vk) ** 2 > threshold:
                Gkhat = Ak / Vk
                dC = R[k] - Gkhat
                deltaC = dC * (epsilon * abs(Vk) ** 2 / (delta + abs(Ak) ** 2))
                R[k] = R[k] - deltaC
    return E, R


def _golden_kalman(V, A, beta, sigma2, threshold):
    R = np.zeros(F, complex)
    s2v = np.full(F, sigma2)
    Kk = np.full(F, sigma2)
    E = np.zeros((T, F), complex)
    for t in range(T):
        for m in range(F):
            Vk, Ak = V[t, m], A[t, m]
            Ek = Ak - R[m] * Vk
            E[t, m] = Ek
            if abs(Vk) ** 2 > threshold:
                s2v[m] = beta * s2v[m] + (1 - beta) * abs(Ek) ** 2
                Kk1 = Kk[m] + sigma2
                s2s = abs(Vk) ** 2 * Kk1 + s2v[m]
                Gk = np.conj(Vk) * Kk1 / s2s
                R[m] = R[m] + Gk * Ek
                Kk[m] = (1 - Kk1 * abs(Vk) ** 2 / s2s) * Kk1
    return E, R


def _golden_block_kalman(V, A, N, beta, sigmau2, sigmak2, threshold):
    R = np.zeros((F, N), complex)
    s2v = np.full(F, sigmau2)
    Kk = np.array([sigmak2 * np.eye(N) for _ in range(F)], complex)
    E = np.zeros((T, F), complex)
    Vp = np.vstack([np.zeros((N - 1, F), complex), V])
    for t in range(T):
        for m in range(F):
            taps = np.array([Vp[t + N - 1 - n, m] for n in range(N)])
            Ak = A[t, m]
            Ek = Ak - np.dot(R[m], taps)  # zdotu
            E[t, m] = Ek
            if abs(taps[0]) ** 2 > threshold:
                s2v[m] = beta * s2v[m] + (1 - beta) * abs(Ek) ** 2
                Kk1 = Kk[m] + sigmau2 * np.eye(N)
                scr = Kk1 @ np.conj(taps)
                s2s = np.real(np.dot(taps, scr)) + s2v[m]
                Gk = scr / s2s
                R[m] = R[m] + Ek * Gk
                Kk[m] = (np.eye(N) - np.outer(Gk, taps)) @ Kk1
    return E, R


def test_nlms_matches_golden(rng):
    V, A, _ = _streams(rng)
    golden_E, golden_R = _golden_nlms(V.astype(complex), A.astype(complex), 100.0, 1e-4, 100.0)
    E, R = aec.nlms_aec(V, A, 100.0, 1e-4, 100.0)
    np.testing.assert_allclose(np.asarray(E), golden_E, atol=1e-3)
    np.testing.assert_allclose(np.asarray(R), golden_R, atol=1e-4)


def test_kalman_matches_golden(rng):
    V, A, _ = _streams(rng)
    golden_E, golden_R = _golden_kalman(V.astype(complex), A.astype(complex), 0.95, 1e-3, 100.0)
    E, R = aec.kalman_aec(V, A, 0.95, 1e-3, 100.0)
    scale = np.abs(golden_E).max()
    np.testing.assert_allclose(np.asarray(E) / scale, golden_E / scale, atol=2e-4)
    np.testing.assert_allclose(np.asarray(R), golden_R, atol=2e-3)


@pytest.mark.parametrize("N", [1, 3])
def test_block_kalman_matches_golden(N, rng):
    V, A, _ = _streams(rng)
    golden_E, golden_R = _golden_block_kalman(
        V.astype(complex), A.astype(complex), N, 0.95, 1e-3, 5.0, 100.0
    )
    E, R = aec.block_kalman_aec(V, A, N, 0.95, 1e-3, 5.0, 100.0)
    scale = np.abs(golden_E).max()
    np.testing.assert_allclose(np.asarray(E) / scale, golden_E / scale, atol=2e-4)
    np.testing.assert_allclose(np.asarray(R), golden_R, atol=5e-3)


def test_kalman_cancels_echo(rng):
    """Echo-dominated recording: the canceller should converge to the echo
    path and the tail error should approach the near-end signal."""
    T2 = 300
    V = (rng.standard_normal((T2, F)) + 1j * rng.standard_normal((T2, F))).astype(np.complex64) * 20
    near = (rng.standard_normal((T2, F)) + 1j * rng.standard_normal((T2, F))).astype(np.complex64)
    A = (2.0 * np.exp(1j * 0.3) * V + near).astype(np.complex64)
    E, R = aec.kalman_aec(V, A, beta=0.95, sigma2=1e-3, threshold=1.0)
    E = np.asarray(E)
    echo_before = np.mean(np.abs(A[-20:] - near[-20:]) ** 2)
    echo_after = np.mean(np.abs(E[-20:] - near[-20:]) ** 2)
    assert echo_after < 0.05 * echo_before
    # estimated filter close to the true echo path
    np.testing.assert_allclose(np.asarray(R), 2.0 * np.exp(1j * 0.3) * np.ones(F), atol=0.2)


def test_dtd_and_information_filter_run(rng):
    V, A, _ = _streams(rng)
    E1, R1 = aec.dtd_block_kalman_aec(V, A, sampleN=2, eng_th=1.0)
    E2, R2 = aec.information_filter_aec(V, A, sampleN=2, eng_th=1.0)
    for out in (E1, R1, E2, R2):
        assert np.isfinite(np.asarray(out)).all()


def test_sqrt_information_filter_matches_information_filter(rng):
    """The square-root propagation must track the dense information filter."""
    T2, F2 = 300, 5
    V = (rng.standard_normal((T2, F2)) + 1j * rng.standard_normal((T2, F2))).astype(np.complex64) * 20
    A = (0.8 * np.exp(1j * 0.3) * V).astype(np.complex64)
    E1, R1 = aec.information_filter_aec(V, A, sampleN=2, eng_th=1.0, loading=1e-4)
    E2, R2 = aec.sqrt_information_filter_aec(V, A, sampleN=2, eng_th=1.0, loading=1e-4)
    assert np.isfinite(np.asarray(E2)).all()
    # both should cancel most of the echo by the end
    tail1 = np.mean(np.abs(np.asarray(E1)[-30:]) ** 2)
    tail2 = np.mean(np.abs(np.asarray(E2)[-30:]) ** 2)
    raw = np.mean(np.abs(A[-30:]) ** 2)
    assert tail2 < 0.2 * raw, (tail2, raw)  # SRIF init (K=sigma_u^2, reference quirk) adapts slower
    assert tail1 < 0.1 * raw
