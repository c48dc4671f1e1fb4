"""Binaural ITD/IID masking tests."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import binaural as bn

F, T = 33, 60
FFTLEN = 2 * (F - 1)


def _binaural_scene(rng, delay_samples=3.0):
    """Target identical in both ears; interferer delayed in the right ear."""
    tgt = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)
    jam = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)
    k = np.arange(F)
    phase = np.exp(-1j * 2 * np.pi * k * delay_samples / FFTLEN)
    XL = tgt + jam
    XR = tgt + jam * phase
    return XL.astype(np.complex64), XR.astype(np.complex64), tgt, jam


def test_itd_of_pure_delay(rng):
    x = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)
    d = 2.0
    k = np.arange(F)
    XR = x * np.exp(-1j * 2 * np.pi * k * d / FFTLEN)
    itd = np.asarray(bn.calc_itd(x, XR))
    # wrapping limits exact recovery to low bins
    lo = slice(1, F // 4)
    np.testing.assert_allclose(itd[:, lo], d, atol=1e-4)


def test_kim_mask_keeps_target_bins(rng):
    XL, XR, tgt, jam = _binaural_scene(rng)
    # target-dominant bins have ITD ~ 0, jam-dominant larger
    out = np.asarray(bn.kim_binary_mask(XL, XR, chan=0, threshold=1.0, alpha=0.0, d_eta=0.01))
    # masked output closer to target than the raw left channel
    err_raw = np.abs(XL - tgt).mean()
    err_msk = np.abs(out - tgt).mean()
    assert err_msk < err_raw


def test_kim_threshold_grid_runs(rng):
    XL, XR, _, _ = _binaural_scene(rng)
    th, cands, rho = bn.kim_itd_threshold(XL, XR, -5.0, 5.0, 0.5)
    assert cands[0] <= th <= cands[-1]
    assert len(rho) == len(cands)
    assert np.isfinite(rho).all()


def test_iid_mask_and_threshold(rng):
    # left channel has the stronger target
    XL, XR, tgt, _ = _binaural_scene(rng)
    XL2 = 2.0 * XL
    out = np.asarray(bn.iid_binary_mask(XL2, XR, chan=0, threshold=0.0, alpha=0.0))
    assert np.isfinite(out).all()
    th, cands, cost = bn.iid_threshold(XL2, XR, -2.0, 2.0, 0.25)
    assert cands[0] <= th <= cands[-1]
    assert np.isfinite(cost).all()


def test_fd_iid_threshold_matches_reference_loop():
    """Vectorized FD-IID threshold == frame/bin/candidate transliteration of
    FDIIDThresholdEstimator (binauralprocessing.cc:794-898)."""
    from distant_speech_recognition_tpu.models.binaural import fd_iid_threshold

    rng = np.random.default_rng(11)
    T, F = 60, 9
    XL = rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))
    XR = rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))
    act = rng.random(T) < 0.3
    XL[act, 1:5] *= 6.0

    lo, hi, width, eta, q, beta = -4.0, 4.0, 0.5, 0.01, 1.0 / 15.0, 3.0
    cands = np.arange(lo, hi + 1e-9, width)
    K = len(cands)
    Y4 = np.zeros((F, K)); mean = np.zeros((F, K)); sig = np.zeros((F, K))
    for t in range(T):
        for f in range(1, F):
            for k, th in enumerate(cands):
                PT, PI = abs(XL[t, f]), abs(XR[t, f])
                muT = eta if PT <= PI + th else 1.0
                muI = eta if PI <= PT + th else 1.0
                y1T = (PT * muT) ** (2 * q)
                y1I = (PI * muI) ** (2 * q)
                Y4[f, k] += y1T**4 + y1I**4
                mean[f, k] += y1T + y1I
                sig[f, k] += y1T**2 + y1I**2
    Y4 /= T; sig /= T
    cost_ref = Y4 - beta * sig * sig
    thr_ref = np.zeros(F)
    thr_ref[0] = cands[0]
    for f in range(1, F):
        best, rho_min = cands[0], np.inf
        for k, th in enumerate(cands):
            rho = -cost_ref[f, k]
            if rho <= rho_min:
                best, rho_min = th, rho
        thr_ref[f] = best

    thr, grid, cost = fd_iid_threshold(XL, XR, lo, hi, width, eta, q, beta)
    np.testing.assert_allclose(grid, cands)
    np.testing.assert_allclose(cost[1:], cost_ref[1:], rtol=1e-10)
    np.testing.assert_allclose(thr, thr_ref)
