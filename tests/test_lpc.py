"""LPC estimator tests: recover known AR processes."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import lpc


def _ar_signal(rng, coeffs, N=8000):
    """x[n] = sum coeffs_k x[n-k] + e[n]."""
    p = len(coeffs)
    x = np.zeros(N)
    e = rng.standard_normal(N)
    for n in range(N):
        acc = e[n]
        for k in range(p):
            if n - k - 1 >= 0:
                acc += coeffs[k] * x[n - k - 1]
        x[n] = acc
    return x.astype(np.float32)


def test_levinson_recovers_ar2(rng):
    true = [1.2, -0.6]
    x = _ar_signal(rng, true)
    r = np.asarray(lpc.autocorrelation(x, 2))
    a, E = lpc.levinson_durbin(r, 2)
    np.testing.assert_allclose(np.asarray(a), true, atol=0.05)
    assert 0.5 < float(E) < 2.0  # ~ innovation variance


def test_levinson_matches_numpy_solve(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    order = 6
    r = np.asarray(lpc.autocorrelation(x, order), np.float64)
    a, E = lpc.levinson_durbin(r, order)
    # direct Toeplitz solve
    import scipy.linalg

    R = scipy.linalg.toeplitz(r[:order])
    want = np.linalg.solve(R, r[1 : order + 1])
    np.testing.assert_allclose(np.asarray(a), want, atol=1e-3)


def test_burg_recovers_ar2(rng):
    true = [1.2, -0.6]
    x = _ar_signal(rng, true)
    a, E = lpc.burg(x, 2)
    np.testing.assert_allclose(np.asarray(a), true, atol=0.05)


def test_lpc_spectrum_peaks_at_resonance(rng):
    # AR(2) resonance at w0: poles at r e^{+-j w0}
    w0, rr = 0.3 * np.pi, 0.95
    coeffs = [2 * rr * np.cos(w0), -(rr**2)]
    x = _ar_signal(rng, coeffs)
    r = np.asarray(lpc.autocorrelation(x, 2))
    a, E = lpc.levinson_durbin(r, 2)
    S = np.asarray(lpc.lpc_spectrum(a, E, 256))
    peak_bin = S.argmax()
    np.testing.assert_allclose(peak_bin / 256 * 2 * np.pi, w0, atol=0.1)

    # MVDR envelope peaks near the same resonance, smoother
    Smv = np.asarray(lpc.mvdr_envelope(a, E, 256))
    assert abs(Smv.argmax() - peak_bin) <= 2
    assert np.isfinite(Smv).all()


def test_warped_autocorrelation_zero_warp_matches_plain(rng):
    x = rng.standard_normal(512).astype(np.float32)
    r0 = np.asarray(lpc.autocorrelation(x, 4))
    rw = np.asarray(lpc.warped_autocorrelation(x, 4, 0.0))
    np.testing.assert_allclose(rw, r0, atol=1e-3)


def test_lpc_cepstrum_runs(rng):
    x = _ar_signal(rng, [1.2, -0.6])
    r = np.asarray(lpc.autocorrelation(x, 4))
    a, E = lpc.levinson_durbin(r, 4)
    c = np.asarray(lpc.lpc_cepstrum(a, E, 10))
    assert c.shape == (10,)
    np.testing.assert_allclose(c[0], np.asarray(a)[0], atol=1e-5)  # c1 = a1


def test_frame_envelopes_and_cepstral_estimator(rng):
    frames = rng.standard_normal((6, 256)).astype(np.float32)
    env = np.asarray(lpc.lpc_envelope_frames(frames, 12, 256))
    assert env.shape == (6, 129) and np.isfinite(env).all()

    spec = np.fft.fft(frames, axis=-1).astype(np.complex64)
    smooth = np.asarray(lpc.cepstral_spectrum_estimator(spec, order=14))
    assert smooth.shape == spec.shape and np.isfinite(smooth).all()
    # smoother than raw magnitude: fewer sign changes in the derivative
    raw = np.abs(spec[0])
    def roughness(v):
        return np.abs(np.diff(np.sign(np.diff(v)))).sum()
    assert roughness(smooth[0]) < roughness(raw)
