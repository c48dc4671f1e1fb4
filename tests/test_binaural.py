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
