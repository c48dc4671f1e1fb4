"""WPE dereverberation tests: golden per-bin transliteration + functional."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import dereverberation as drv

SUBBAND_FLOOR = 1e-3


def _golden_single_channel_wpe(Y, lowerN, upperN, iterations, load_db):
    """Transliteration of SingleChannelWPEDereverberationFeature
    (dereverberation.cc:96-275), float64, one bin at a time."""
    T, F = Y.shape
    P = upperN - lowerN + 1
    load = 10.0 ** (load_db / 10.0)
    G = np.zeros((F, P), complex)

    def lags(f, t):  # l_t[p] = y[t - lowerN - p]
        out = np.zeros(P, complex)
        for p in range(P):
            idx = t - lowerN - p
            if idx >= 0:
                out[p] = Y[idx, f]
        return out

    for _ in range(iterations):
        # calc_Thetan_
        theta = np.zeros((T, F))
        for t in range(T):
            for f in range(F):
                cur = Y[t, f]
                if t >= lowerN:
                    cur = cur - np.vdot(G[f], lags(f, t))
                theta[t, f] = max(abs(cur), SUBBAND_FLOOR) ** 2
        # per subband: R, r, load, solve
        for f in range(F):
            R = np.zeros((P, P), complex)
            r = np.zeros(P, complex)
            for t in range(lowerN, T):
                l = lags(f, t)
                R += np.outer(l, np.conj(l)) / theta[t, f]
                r += np.conj(Y[t, f]) * l / theta[t, f]
            md = np.abs(np.diag(R)).max()
            for p in range(P):
                R[p, p] = abs(R[p, p]) + md * load
            G[f] = np.linalg.solve(R, r)

    # Streaming apply (next(), dereverberation.cc:227-275): the ring buffer
    # keeps only P frames but lags index yn_[size-1-lowerN-lagX], so taps
    # p >= P - lowerN read zeros — verified against the compiled reference
    # (tests/test_cpp_golden.py); see models.dereverberation.wpe_apply.
    Gq = G.copy()
    if lowerN > 0:
        Gq[:, P - lowerN:] = 0.0
    out = Y.astype(complex).copy()
    for t in range(T):
        if t >= lowerN:
            for f in range(F):
                out[t, f] -= np.vdot(Gq[f], lags(f, t))
    return out, G


def test_single_channel_wpe_matches_golden(rng):
    T, F = 40, 5
    lowerN, upperN, iters = 2, 5, 2
    Y = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)

    golden, G_golden = _golden_single_channel_wpe(
        Y.astype(np.complex128), lowerN, upperN, iters, -20.0
    )
    G = np.asarray(drv.wpe_estimate(Y[None], lowerN, upperN, iters, -20.0))[0]
    ours = np.asarray(drv.wpe(Y, lowerN, upperN, iters, -20.0))

    np.testing.assert_allclose(G, G_golden, atol=2e-3)
    np.testing.assert_allclose(ours, golden, atol=2e-3)


def test_multichannel_wpe_shapes_and_finite(rng):
    C, T, F = 3, 50, 7
    Y = (rng.standard_normal((C, T, F)) + 1j * rng.standard_normal((C, T, F))).astype(np.complex64)
    out = np.asarray(drv.wpe_multichannel(Y, 2, 6, iterations=2, diagonal_bias=1e-6))
    assert out.shape == (C, T, F)
    assert np.isfinite(out).all()
    # early frames (t < lowerN) pass through unchanged
    np.testing.assert_allclose(out[:, :2], Y[:, :2], atol=1e-6)


def test_wpe_reduces_reverberation(rng):
    """Synthetic exponentially-decaying subband reverberation is suppressed."""
    T, F = 400, 8
    # speech-like: smoothly modulated envelope (no exact zeros — those floor
    # the WPE variance at 1e-3 and the reference's max-diagonal loading then
    # over-regularizes)
    env = 0.3 + np.abs(np.convolve(rng.standard_normal(T), np.ones(20) / 20, "same"))
    dry = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))) * env[:, None]
    rev = dry.copy()
    a = 0.55
    for t in range(3, T):
        rev[t] += a * rev[t - 3] * np.exp(1j * 0.4)
    rev = rev.astype(np.complex64)

    err_before = np.mean(np.abs(rev[10:] - dry[10:]) ** 2)
    # default -20 dB loading: moderate shortening (reference behavior)
    out = np.asarray(drv.wpe(rev, lowerN=3, upperN=8, iterations=3))
    err_after = np.mean(np.abs(out[10:] - dry[10:]) ** 2)
    assert err_after < 0.75 * err_before, (err_before, err_after)
    # light loading: strong suppression
    out2 = np.asarray(drv.wpe(rev, lowerN=3, upperN=8, iterations=3, load_db=-40.0))
    err_after2 = np.mean(np.abs(out2[10:] - dry[10:]) ** 2)
    assert err_after2 < 0.4 * err_before, (err_before, err_after2)
