"""Postfilter equivalence tests against per-frame/per-bin numpy goldens."""

import numpy as np
import pytest

import distant_speech_recognition_tpu.models.postfilter as pf
import distant_speech_recognition_tpu.models.beamforming as bf

F, C, T = 9, 4, 20
SPECTRAL_FLOOR = 1e-4


def _data(rng):
    X = (rng.standard_normal((T, F, C)) + 1j * rng.standard_normal((T, F, C))).astype(np.complex64)
    wq = (rng.standard_normal((F, C)) + 1j * rng.standard_normal((F, C))).astype(np.complex64)
    wq /= np.abs(wq)  # unit-modulus manifold-like
    wq /= C
    Y = np.einsum("fc,tfc->tf", np.conj(wq), X).astype(np.complex64)
    return X, wq, Y


def _golden_zelinski(X, wq, Y, alpha, real_mode, min_frames):
    """ZelinskiFilter_f transliteration (postfilter.cc:57-148)."""
    out = Y.astype(complex).copy()
    csd = np.zeros((F, C, C), complex)  # upper triangle CSDs + diag PSDs
    for t in range(T):
        a = alpha if t > 1 else 0.0  # pre-increment frame_no_ > 0
        for f in range(F):
            y = np.conj(wq[f]) * X[t, f]
            ssum = 0.0 + 0j
            for i in range(C - 1):
                for j in range(i + 1, C):
                    cur = y[i] * np.conj(y[j])
                    if a > 0:
                        cur = a * csd[f, i, j] + (1 - a) * cur
                    csd[f, i, j] = cur
                    ssum += cur
            num = max(ssum.real, 0.0) if real_mode else abs(ssum)
            den = 0.0
            for i in range(C):
                est = abs(y[i]) ** 2
                if a > 0:
                    est = a * csd[f, i, i].real + (1 - a) * est
                csd[f, i, i] = est
                den += est
            W = np.clip((num / den) * 2.0 / (C - 1.0), SPECTRAL_FLOOR, 1.0)
            if t > min_frames:  # NO_USE gate reads frame_no_ = t-1
                out[t, f] = Y[t, f] * W
    return out


@pytest.mark.parametrize("real_mode", [True, False])
def test_zelinski_matches_golden(real_mode, rng):
    X, wq, Y = _data(rng)
    ptype = pf.PostFilterType.ZELINSKI1_REAL if real_mode else pf.PostFilterType.ZELINSKI1_ABS
    ours = np.asarray(pf.zelinski_postfilter(X, Y, wq, alpha=0.6, pf_type=ptype, min_frames=3))
    golden = _golden_zelinski(X, wq, Y, 0.6, real_mode, 3)
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_mccowan_matches_golden(rng):
    """McCowan postfilter vs transliteration of postfilter.cc:798-901."""
    X, wq, Y = _data(rng)
    mpos = np.c_[np.arange(C) * 40.0, np.zeros((C, 2))]
    Gamma = np.asarray(bf.diffuse_noise_coherence(mpos, (F - 1) * 2, 16000.0)).astype(complex)
    alpha, thresh = 0.6, 0.99

    ours = np.asarray(
        pf.mccowan_postfilter(X, Y, wq, Gamma.astype(np.complex64), alpha=alpha, min_frames=0)
    )

    out = Y.astype(complex).copy()
    csd = np.zeros((F, C, C), complex)
    for t in range(T):
        a = alpha if t > 1 else 0.0  # pre-increment frame_no_ > 0
        for f in range(F):
            y = np.conj(wq[f]) * X[t, f]
            for i in range(C - 1):
                for j in range(i + 1, C):
                    cur = y[i] * np.conj(y[j])
                    if a > 0:
                        cur = a * csd[f, i, j] + (1 - a) * cur
                    csd[f, i, j] = cur
            den = 0.0
            for i in range(C):
                est = abs(y[i]) ** 2
                if a > 0:
                    est = a * csd[f, i, i].real + (1 - a) * est
                csd[f, i, i] = est
                den += est
            den /= C
            ssum = 0.0 + 0j
            for i in range(C - 1):
                for j in range(i + 1, C):
                    Rij = Gamma[f, i, j]
                    if Rij.real > thresh and Rij.imag <= 0:
                        Rij = thresh
                    phi_ii, phi_jj = csd[f, i, i].real, csd[f, j, j].real
                    nu = csd[f, i, j] - 0.5 * Rij * (phi_ii + phi_jj)
                    ssum += nu / (1 - Rij)
            nu_avg = 2.0 * ssum.real / (C * (C - 1.0))
            W = np.clip(nu_avg / den, SPECTRAL_FLOOR, 1.0)
            if t > 0:  # apply gate reads frame_no_ = t-1 (min_frames=0)
                out[t, f] = Y[t, f] * W
    np.testing.assert_allclose(ours, out, atol=3e-5)


def test_apab_unit_for_ds_reference():
    """With x_ref = D&S output itself, W = 1 everywhere (except floor cases)."""
    rng = np.random.default_rng(7)
    X, wq, Y = _data(rng)
    ours = np.asarray(pf.apab_postfilter(X, Y, wq, channel=-1))
    np.testing.assert_allclose(ours, Y, atol=1e-5)


def test_spectral_subtraction_removes_stationary_noise(rng):
    T2 = 200
    noise = (rng.standard_normal((T2, F)) + 1j * rng.standard_normal((T2, F))).astype(np.complex64)
    sig = np.zeros((T2, F), np.complex64)
    sig[T2 // 2 :] = 10.0 * (rng.standard_normal((T2 // 2, F)) + 1j * rng.standard_normal((T2 // 2, F)))
    X = sig + noise
    npsd = pf.average_noise_psd(X[: T2 // 2])
    # ft=2 oversubtraction: residual of exponential noise power ~ e^-2
    out = np.asarray(pf.spectral_subtract(X, npsd, ft=2.0, flooring=1e-3))
    assert np.mean(np.abs(out[: T2 // 2]) ** 2) < 0.25 * np.mean(np.abs(X[: T2 // 2]) ** 2)
    assert np.mean(np.abs(out[T2 // 2 :]) ** 2) > 0.8 * np.mean(np.abs(sig[T2 // 2 :]) ** 2)


def test_wiener_filter_golden(rng):
    St = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)
    Nt = (0.5 * (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F)))).astype(np.complex64)
    alpha, beta, floor = 0.8, 1.0, 1e-4
    ours = np.asarray(pf.wiener_filter(St, Nt, alpha=alpha, flooring=floor, beta=beta))
    ps = np.zeros(F); pn = np.zeros(F)
    golden = np.zeros((T, F), complex)
    for t in range(T):
        a = alpha if t > 1 else 0.0  # pre-increment frame_no_ > 0
        cps = np.abs(St[t]) ** 2
        cpn = np.maximum(np.abs(Nt[t]) ** 2, floor)
        ps = a * ps + (1 - a) * cps
        pn = a * pn + (1 - a) * cpn
        H = ps / (ps + beta * pn)
        golden[t] = St[t] * H
        golden[t, 0] = St[t, 0]
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_high_pass_filter():
    Y = np.ones((3, F), np.complex64)
    out = np.asarray(pf.high_pass_filter(Y, 4))
    assert np.all(out[:, :4] == 0) and np.all(out[:, 4:] == 1)
