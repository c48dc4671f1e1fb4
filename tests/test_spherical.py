"""Spherical-harmonic beamformer tests."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import spherical as sph


def test_spherical_harmonic_matches_scipy():
    from scipy.special import sph_harm_y

    for n in range(4):
        for m in range(-n, n + 1):
            th, ph = 0.7, 1.3
            ours = sph.spherical_harmonic(m, n, th, ph)
            # scipy convention: sph_harm_y(n, m, polar, azimuth)
            want = sph_harm_y(n, m, th, ph)
            np.testing.assert_allclose(ours, want, atol=1e-10)


def test_sh_orthonormality_eigenmike():
    """SH sampled on the Eigenmike grid are near-orthonormal up to order 3:
    (4pi/C) Y Y^H ~ I."""
    theta_s, phi_s = sph.eigenmike_geometry()
    Y = sph.spherical_harmonics_matrix(4, theta_s, phi_s)
    C = Y.shape[1]
    G = (4 * np.pi / C) * (Y @ np.conj(Y).T)
    np.testing.assert_allclose(G, np.eye(16), atol=0.15)


def test_mode_amplitudes_low_freq_limits():
    b = sph.mode_amplitudes(4, np.array([0.0, 0.1, 1.0, 3.0]))
    assert b.shape == (4, 4)
    np.testing.assert_allclose(b[0], 1.0)  # ka=0 convention
    # |b_n| decays with order at small ka
    mags = np.abs(b[1])
    assert mags[0] > mags[1] > mags[2] > mags[3]
    assert np.isfinite(b).all()


def test_eigenbeamformer_recovers_plane_wave_direction():
    """A simulated plane wave on the rigid sphere is beamformed with unit
    response toward its own direction and attenuated elsewhere."""
    max_order = 4
    theta_s, phi_s = sph.eigenmike_geometry()
    C = len(theta_s)
    ka = np.array([1.5, 2.0, 2.5])
    src = (1.2, 0.4)
    X = sph.plane_wave_on_rigid_sphere(max_order, ka, theta_s, phi_s, *src)  # [F, C]
    Xt = X[None].astype(np.complex64)  # [T=1, F, C]

    F = np.asarray(sph.sh_transform(Xt, sph.spherical_harmonics_matrix(max_order, theta_s, phi_s)))
    b = sph.mode_amplitudes(max_order, ka)

    w_on = sph.eigen_weights(max_order, b, src[0], src[1], C, dc_bin0=False)
    w_off = sph.eigen_weights(max_order, b, 2.4, -1.8, C, dc_bin0=False)
    y_on = np.abs(np.asarray(sph.apply_sh_weights(w_on, F)))
    y_off = np.abs(np.asarray(sph.apply_sh_weights(w_off, F)))
    assert (y_on > 3.0 * y_off).all(), (y_on, y_off)


def test_srp_spherical_finds_source():
    max_order = 3
    theta_s, phi_s = sph.eigenmike_geometry()
    C = len(theta_s)
    ka = np.array([1.0, 2.0])
    src_theta, src_phi = np.pi / 2, 0.8
    X = sph.plane_wave_on_rigid_sphere(max_order, ka, theta_s, phi_s, src_theta, src_phi)
    F = np.asarray(
        sph.sh_transform(X[None].astype(np.complex64),
                         sph.spherical_harmonics_matrix(max_order, theta_s, phi_s))
    )
    b = sph.mode_amplitudes(max_order, ka)
    phis = np.linspace(-np.pi, np.pi, 36, endpoint=False)
    srp, grid = sph.srp_spherical(F, max_order, b, C, [np.pi / 2], phis)
    best = np.asarray(grid)[np.asarray(srp)[0].argmax()]
    err = np.angle(np.exp(1j * (best[1] - src_phi)))
    assert abs(err) < 0.25, best


def test_spherical_ds_weights_shapes():
    b = sph.mode_amplitudes(3, np.linspace(0, 3, 9))
    w = sph.spherical_ds_weights(3, b, 1.0, 0.5)
    assert w.shape == (9, 9)
    w2 = sph.hwnc_weights(3, b, 1.0, 0.5, num_sensors=32)
    assert np.isfinite(w2).all()


def test_spherical_tracker_follows_moving_source():
    """SH-domain EKF tracks a plane-wave source moving in azimuth on the
    Eigenmike (tracker.cc equivalent)."""
    from distant_speech_recognition_tpu.models import spherical_tracker as spt

    max_order = 3
    theta_s, phi_s = sph.eigenmike_geometry()
    ka = np.linspace(0.8, 3.0, 9)
    Y_mat, bn4pi = spt.make_tracker_tables(max_order, ka, theta_s, phi_s)

    rng = np.random.default_rng(0)
    T = 60
    true_theta = np.full(T, np.pi / 2)
    true_phi = 0.3 + 0.01 * np.arange(T)  # slow azimuth drift
    X = np.zeros((T, len(ka), len(theta_s)), np.complex64)
    for t in range(T):
        amp = rng.standard_normal(len(ka)) + 1j * rng.standard_normal(len(ka))
        pw = sph.plane_wave_on_rigid_sphere(max_order, ka, theta_s, phi_s,
                                            true_theta[t], true_phi[t])
        X[t] = (amp[:, None] * pw).astype(np.complex64)

    cfg = spt.SphericalTrackerConfig(max_order=max_order, num_subbands_used=5,
                                     sigmaV2=1e-2, sigmaU2=1e-3)
    track = np.asarray(
        spt.spherical_track(cfg, X, Y_mat, bn4pi, (np.pi / 2 + 0.2, 0.0))
    )
    # converges to and follows the true azimuth
    err_phi = np.abs(np.angle(np.exp(1j * (track[-10:, 1] - true_phi[-10:]))))
    assert err_phi.mean() < 0.1, (track[-5:], true_phi[-5:])
    err_th = np.abs(track[-10:, 0] - true_theta[-10:])
    assert err_th.mean() < 0.15
