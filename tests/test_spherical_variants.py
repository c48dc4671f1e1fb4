"""Tests for the element-space spherical beamformer variants and SEMNB."""

import numpy as np
import jax.numpy as jnp

from distant_speech_recognition_tpu.models.spherical import (
    eigenmike_geometry,
    mode_amplitudes,
    plane_wave_on_rigid_sphere,
    spherical_diffuse_coherence,
    spherical_ds_weights,
    spherical_harmonics_matrix,
    spherical_hwnc_gsc_weights,
    spherical_moen_weights,
    spherical_spatial_ds_weights,
    spherical_spatial_hwnc_weights,
    dual_spherical_ds_weights,
)

A_MM = 42.0  # eigenmike radius
FS = 16000.0


def _setup(max_order=3, nbins=6):
    theta_s, phi_s = eigenmike_geometry()
    fftlen = 64
    k = np.arange(1, nbins + 1)
    ka = 2 * np.pi * k * (FS / fftlen) * A_MM / 343740.0
    b = mode_amplitudes(max_order, ka)
    Y = spherical_harmonics_matrix(max_order, theta_s, phi_s)
    return theta_s, phi_s, ka, b, Y


def _response(w, p):
    """y = w^H p per bin (zdotc application convention)."""
    return np.einsum("fc,fc->f", np.conj(w), p)


def test_spatial_ds_steers_to_look_direction():
    theta_s, phi_s, ka, b, Y = _setup()
    look = (1.0, 0.5)
    w = spherical_spatial_ds_weights(3, b, Y, *look)
    p_look = plane_wave_on_rigid_sphere(3, ka, theta_s, phi_s, *look)
    p_away = plane_wave_on_rigid_sphere(3, ka, theta_s, phi_s, 2.4, 3.5)
    r_look = np.abs(_response(w, p_look))
    r_away = np.abs(_response(w, p_away))
    assert np.all(r_look > r_away)


def test_spatial_hwnc_distortionless_and_beats_ds_in_diffuse_noise():
    theta_s, phi_s, ka, b, Y = _setup()
    look = (1.2, 2.0)
    C = Y.shape[1]
    w = spherical_spatial_hwnc_weights(3, b, Y, *look, sigma2=1e-4)
    # undo the fixed output scaling -> MVDR with w^H v = 1 on the unit
    # steering vector (modalbeamformer.cc:2399-2420)
    coeff = 16 * np.pi**2 / (C * 9)
    v = spherical_spatial_ds_weights(3, b, Y, *look)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    resp = _response(w / coeff, v)
    np.testing.assert_allclose(resp, 1.0, atol=1e-8)
    # diffuse-noise output power no worse than the D&S beamformer's
    Sigma = spherical_diffuse_coherence(3, b, Y, 1e-4)
    wn = w / np.linalg.norm(w, axis=-1, keepdims=True)
    dsn = v
    p_mvdr = np.real(np.einsum("fc,fce,fe->f", np.conj(wn), Sigma, wn))
    p_ds = np.real(np.einsum("fc,fce,fe->f", np.conj(dsn), Sigma, dsn))
    assert np.all(p_mvdr <= p_ds + 1e-12)


def test_moen_weights_prefer_look_direction():
    theta_s, phi_s, ka, b, Y = _setup()
    look = (0.9, 1.1)
    w = spherical_moen_weights(3, b, Y, *look, diagonal_weight=1e-4)
    assert w.shape == (len(ka), len(theta_s))
    p_look = plane_wave_on_rigid_sphere(3, ka, theta_s, phi_s, *look)
    p_away = plane_wave_on_rigid_sphere(3, ka, theta_s, phi_s, 2.6, 4.0)
    assert np.all(np.abs(_response(w, p_look)) > np.abs(_response(w, p_away)))


def test_dual_spherical_ds_returns_both_domains():
    _, _, ka, b, _ = _setup()
    rng = np.random.default_rng(0)
    mpos = rng.standard_normal((8, 3)) * 40.0
    w_sh, w_elem = dual_spherical_ds_weights(3, b, 0.7, 0.3, mpos, 64, FS)
    np.testing.assert_allclose(w_sh, spherical_ds_weights(3, b, 0.7, 0.3))
    assert w_elem.shape[-1] == 8
    # element-space part is a unit-gain delay-and-sum: |w| = 1/C
    np.testing.assert_allclose(np.abs(w_elem), 1.0 / 8, atol=1e-6)


def test_hwnc_gsc_blocking_matrix_blocks_steering():
    _, _, ka, b, _ = _setup()
    wqH, BmH = spherical_hwnc_gsc_weights(3, b, 1.0, 0.5, num_sensors=32)
    vs = np.conj(wqH)  # steering vector in SH space
    resid = np.einsum("fkd,fd->fk", BmH, vs)
    assert np.max(np.abs(resid)) < 1e-4


def test_semnb_derivative_matches_finite_differences():
    from distant_speech_recognition_tpu.models.lpc import semnb_deviation_derivative

    order, fftlen = 8, 64
    rng = np.random.default_rng(3)
    # smooth positive power spectrum
    base = 1.0 + 0.5 * np.sin(np.linspace(0, 3, fftlen // 2 + 1)) + 0.1 * rng.random(fftlen // 2 + 1)
    d = np.asarray(semnb_deviation_derivative(jnp.asarray(base), order, fftlen))
    assert d.shape == (fftlen // 2 + 1,)
    # central finite differences on a few bins
    import jax

    def sigma_m(P, m):
        return semnb_deviation_derivative.__wrapped__(P, order, fftlen) if False else None

    eps = 1e-5
    for m in [0, 5, 17, fftlen // 2]:
        Pp = base.copy(); Pp[m] += eps
        Pm = base.copy(); Pm[m] -= eps
        # recompute sigma directly through the same forward map
        def sig(P):
            k = np.arange(order + 1)
            mm = np.arange(fftlen // 2 + 1)
            ct = np.cos(2 * np.pi * np.outer(k, mm) / fftlen)
            ac = (2.0 / fftlen) * ct @ P
            idx = np.abs(np.subtract.outer(np.arange(order), np.arange(order)))
            a = np.linalg.solve(ac[idx], ac[1:])
            epsv = ac[0] - a @ ac[1:]
            A = np.fft.rfft(np.concatenate([[-1.0], a]), n=fftlen)
            return np.sqrt(epsv / (np.abs(A) ** 2 + 1e-7))

        fd = (sig(Pp)[m] - sig(Pm)[m]) / (2 * eps)
        np.testing.assert_allclose(d[m], fd, rtol=2e-3, atol=1e-6)
