"""Spherical-harmonic (eigenbeamformer) processing for spherical arrays.

Batched reformulation of beamformer/modalbeamformer.cc: spherical-harmonic
decomposition of rigid-sphere array snapshots, rigid-sphere mode amplitudes
``b_n(ka)``, and the eigenbeamformer family (spherical D&S, HMDI/eigen,
white-noise-gain-constrained) plus SH-domain SRP DOA search.

Index convention: SH coefficients are ordered (n, m) with n = 0..maxOrder-1
and m = -n..n -> dim = maxOrder^2 entries (modalbeamformer.cc:168-180).
All tables (SH bases, mode amplitudes, steering weights) are precomputed in
float64 numpy; runtime application is dense complex64 einsums.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from ..ops.complex_ops import ceinsum

SSPEED_MM_S = 343740.0

__all__ = [
    "sh_index_pairs",
    "spherical_harmonic",
    "spherical_harmonics_matrix",
    "sh_transform",
    "mode_amplitudes",
    "spherical_ds_weights",
    "eigen_weights",
    "hwnc_weights",
    "apply_sh_weights",
    "eigenmike_geometry",
    "srp_spherical",
    "plane_wave_on_rigid_sphere",
    "spherical_gsc_weights",
    "spherical_spatial_ds_weights",
    "spherical_diffuse_coherence",
    "spherical_spatial_hwnc_weights",
    "spherical_moen_weights",
    "dual_spherical_ds_weights",
    "spherical_hwnc_gsc_weights",
]


def sh_index_pairs(max_order: int) -> list[tuple[int, int]]:
    """[(n, m)] in the reference's enumeration order."""
    return [(n, m) for n in range(max_order) for m in range(-n, n + 1)]


def spherical_harmonic(m: int, n: int, theta, phi):
    """Y_n^m(theta, phi) exactly as the reference computes it
    (sphericalHarmonic, modalbeamformer.cc:199-225): GSL's normalized
    associated Legendre (Condon-Shortley included) with the odd-|m| sign
    flip for negative m, times e^{i m phi}."""
    from scipy.special import lpmv
    from math import factorial

    am = abs(m)
    norm = np.sqrt((2 * n + 1) / (4 * np.pi) * factorial(n - am) / factorial(n + am))
    # scipy's lpmv includes the Condon-Shortley phase, like GSL sphPlm
    p = lpmv(am, n, np.cos(theta)) * norm
    if m < 0 and am % 2 != 0:
        p = -p
    return p * np.exp(1j * m * np.asarray(phi))


def spherical_harmonics_matrix(max_order: int, theta_s, phi_s) -> np.ndarray:
    """Y [dim, C]: SH evaluated at the sensor directions."""
    theta_s = np.asarray(theta_s, np.float64)
    phi_s = np.asarray(phi_s, np.float64)
    rows = [spherical_harmonic(m, n, theta_s, phi_s) for n, m in sh_index_pairs(max_order)]
    return np.stack(rows)


def sh_transform(X: jax.Array, Y_matrix) -> jax.Array:
    """Snapshots -> SH coefficients: ``F[idx] = sum_c X_c conj(Y[idx, c])``
    (spherical_harmonics_transformation_ with sh_s = conj(Y),
    modalbeamformer.cc:168-180, 586-618).

    ``X``: [..., T, F, C] -> ``F``: [..., T, F, dim].
    """
    sh = jnp.asarray(np.conj(Y_matrix), jnp.complex64)
    return ceinsum("dc,...tfc->...tfd", sh, X)


def mode_amplitudes(max_order: int, ka) -> np.ndarray:
    """Rigid-sphere mode amplitudes ``b_n(ka) = j_n - (j_n'/h_n') h_n``
    (modeAmplitude, modalbeamformer.cc:41-165; the order<=3 special cases
    are hand expansions of the same formula).  ``ka``: [F].  Returns
    complex [F, max_order]; ka = 0 gives 1."""
    from scipy.special import spherical_jn, spherical_yn

    ka = np.asarray(ka, np.float64)
    out = np.ones((len(ka), max_order), np.complex128)
    nz = ka != 0
    kanz = ka[nz]
    for n in range(max_order):
        jn = spherical_jn(n, kanz)
        yn = spherical_yn(n, kanz)
        djn = spherical_jn(n, kanz, derivative=True)
        dyn = spherical_yn(n, kanz, derivative=True)
        hn = jn + 1j * yn
        dhn = djn + 1j * dyn
        out[nz, n] = jn - (djn / dhn) * hn
    return out


def _i_pow(n: int) -> complex:
    return (1j) ** (n % 4)


def _dc_weights(w: np.ndarray) -> np.ndarray:
    """Bin 0 carries the fixed DC weights [1, 0, ...] — calc_steering_unit_
    computes every modal beamformer's bin-0 weights with calcDCWeights
    (modalbeamformer.cc:226-239, 744-745), not calc_weights_."""
    w[0] = 0.0
    w[0, 0] = 1.0
    return w


def spherical_ds_weights(max_order: int, b: np.ndarray, theta: float, phi: float,
                         normalize: bool = False, wgain: float = 1.0,
                         dc_bin0: bool = True) -> np.ndarray:
    """Spherical D&S weights per bin
    (SphericalDSBeamformer::calc_weights_, modalbeamformer.cc:1045-1082):
    ``w = conj(4 pi Y_n^m(look) conj(i^n b_n))``.  ``b``: [F, max_order];
    row 0 is the DC bin and gets the fixed calcDCWeights row.
    Returns [F, dim]."""
    F = b.shape[0]
    dim = max_order * max_order
    w = np.zeros((F, dim), np.complex128)
    for idx, (n, m) in enumerate(sh_index_pairs(max_order)):
        Y = spherical_harmonic(m, n, theta, phi)
        w[:, idx] = np.conj(4 * np.pi * Y * np.conj(_i_pow(n) * b[:, n]))
    if normalize:
        w *= wgain / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-20)
    return _dc_weights(w) if dc_bin0 else w


def eigen_weights(max_order: int, b: np.ndarray, theta: float, phi: float,
                  num_sensors: int, sigma2: float = 0.01,
                  normalize: bool = False, wgain: float = 1.0,
                  dc_bin0: bool = True) -> np.ndarray:
    """HMDI eigenbeamformer weights (EigenBeamformer::calc_weights_,
    modalbeamformer.cc:330-374; S. Yan):
    ``w = 4 pi conj(Y(look)) i^n b_n / (dim C (|b_n|^2 + sigma^2))``."""
    F = b.shape[0]
    dim = max_order * max_order
    norm = dim * num_sensors
    w = np.zeros((F, dim), np.complex128)
    for idx, (n, m) in enumerate(sh_index_pairs(max_order)):
        YmnA = np.conj(spherical_harmonic(m, n, theta, phi))
        bn = b[:, n]
        w[:, idx] = 4 * np.pi * YmnA * (_i_pow(n) * bn) / (norm * (np.abs(bn) ** 2 + sigma2))
    if normalize:
        w *= wgain / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-20)
    return _dc_weights(w) if dc_bin0 else w


def hwnc_weights(max_order: int, b: np.ndarray, theta: float, phi: float,
                 num_sensors: int, sigma2: float = 0.01, ratio: float = 0.0) -> np.ndarray:
    """White-noise-gain-controlled eigenbeamformer
    (SphericalHWNCBeamformer::calc_weights_, modalbeamformer.cc:1446-1497).
    With ratio <= 0 the reference scales by ``16 pi^2/(C maxOrder^2)``."""
    w = eigen_weights(max_order, b, theta, phi, num_sensors, sigma2)
    if ratio > 0.0:
        # per-bin WNG table (calc_wng, modalbeamformer.cc:1417-1438):
        # wng = ratio * C/(16 pi^2) * sum_n (2n+1)|b_n|^2, then each bin's
        # weight vector is normalized to 2 sqrt(pi / (C wng)).
        n_arr = np.arange(max_order)
        wng = (num_sensors / (16.0 * np.pi**2)) * ratio * np.sum(
            (2 * n_arr + 1)[None, :] * np.abs(b[:, :max_order]) ** 2, axis=-1
        )
        w *= (2.0 * np.sqrt(np.pi / (num_sensors * np.maximum(wng, 1e-20))))[
            :, None
        ] / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-20)
    else:
        w *= (16.0 * np.pi**2) / (num_sensors * max_order * max_order)
    return w


def apply_sh_weights(w, F: jax.Array) -> jax.Array:
    """Beamformer output ``y = w^H F`` over all frames/bins
    (EigenBeamformer::next, modalbeamformer.cc:376-430).

    ``w``: [F, dim]; ``F``: [..., T, F, dim] -> [..., T, F].
    """
    wj = jnp.asarray(np.conj(w), jnp.complex64)
    return ceinsum("fd,...tfd->...tf", wj, F)


def eigenmike_geometry() -> tuple[np.ndarray, np.ndarray]:
    """The em32 Eigenmike sensor directions (theta, phi in radians)
    (EigenBeamformer::set_eigenmike_geometry, modalbeamformer.cc:433-560)."""
    deg = np.array([
        (69, 0), (90, 32), (111, 0), (90, 328), (32, 0), (55, 45), (90, 69),
        (125, 45), (148, 0), (125, 315), (90, 291), (55, 315), (21, 91),
        (58, 90), (121, 90), (159, 89), (69, 180), (90, 212), (111, 180),
        (90, 148), (32, 180), (55, 225), (90, 249), (125, 225), (148, 180),
        (125, 135), (90, 111), (55, 135), (21, 269), (58, 270), (122, 270),
        (159, 271),
    ], np.float64)
    return np.deg2rad(deg[:, 0]), np.deg2rad(deg[:, 1])


def srp_spherical(F_coeffs: jax.Array, max_order: int, b: np.ndarray,
                  num_sensors: int, thetas, phis, sigma2: float = 0.01,
                  min_bin: int = 0, max_bin: int | None = None):
    """SH-domain steered response power over a direction grid
    (DOAEstimatorSRPEB, modalbeamformer.h:33-507 family).

    ``F_coeffs``: [..., T, F, dim].  Returns (srp [..., T, G], grid [G, 2]).
    """
    grid = [(t, p) for t in np.atleast_1d(thetas) for p in np.atleast_1d(phis)]
    W = np.stack([
        eigen_weights(max_order, b, th, ph, num_sensors, sigma2) for th, ph in grid
    ])  # [G, F, dim]
    Wj = jnp.asarray(np.conj(W), jnp.complex64)
    Y = ceinsum("gfd,...tfd->...tgf", Wj, F_coeffs)
    p = jnp.abs(Y) ** 2
    nF = F_coeffs.shape[-2]
    lo = min_bin
    hi = nF if max_bin is None else max_bin
    mask = (jnp.arange(nF) >= lo) & (jnp.arange(nF) < hi)
    return jnp.sum(jnp.where(mask, p, 0.0), axis=-1), jnp.asarray(np.array(grid), jnp.float32)


def plane_wave_on_rigid_sphere(max_order: int, ka, theta_s, phi_s,
                               theta0: float, phi0: float) -> np.ndarray:
    """Sound pressure at rigid-sphere sensors for a unit plane wave from
    (theta0, phi0): ``p_c = sum_{n,m} 4 pi i^n b_n(ka) Y_n^m(dir_c)
    conj(Y_n^m(src))`` (PlaneWaveSimulator, beamformer/tracker.cc).
    Returns [F, C]."""
    b = mode_amplitudes(max_order, ka)  # [F, order]
    Ys = spherical_harmonics_matrix(max_order, theta_s, phi_s)  # [dim, C]
    out = np.zeros((len(np.atleast_1d(ka)), Ys.shape[1]), np.complex128)
    for idx, (n, m) in enumerate(sh_index_pairs(max_order)):
        Y0 = np.conj(spherical_harmonic(m, n, theta0, phi0))
        out += 4 * np.pi * (_i_pow(n) * b[:, n])[:, None] * Ys[idx][None, :] * Y0
    return out


def spherical_gsc_weights(max_order: int, b: np.ndarray, theta: float, phi: float,
                          Nc: int = 1):
    """SH-domain GSC: spherical D&S quiescent weights + a blocking matrix in
    the SH coefficient space (SphericalGSCBeamformer, modalbeamformer.h /
    cc:1499-1560: wq - wl with B built against the steering vector).

    Returns (wqH [F, dim], BmH [F, dim-Nc, dim]); the adaptive lower branch
    runs through models/adaptive_gsc.gsc_lms/gsc_rls on SH coefficients.
    """
    import jax.numpy as jnp

    from .beamforming import blocking_matrix

    w = spherical_ds_weights(max_order, b, theta, phi)  # [F, dim]
    vs = jnp.asarray(np.conj(w), jnp.complex64)  # steering in SH space
    B = blocking_matrix(vs, Nc)
    return np.conj(np.asarray(vs)), np.swapaxes(np.asarray(B), -1, -2)


def spherical_spatial_ds_weights(max_order: int, b: np.ndarray, Y_matrix: np.ndarray,
                                 theta: float, phi: float) -> np.ndarray:
    """Element-space spherical D&S weights
    (SphericalSpatialDSBeamformer::calc_weights_, modalbeamformer.cc:2126-2180):
    the rigid-sphere pressure model steered at the look direction,

        w_s = (4 pi / C) sum_{n,m} i^n b_n(ka) Y_n^m(Omega_s) conj(Y_n^m(look)).

    ``Y_matrix``: [dim, C] from :func:`spherical_harmonics_matrix` (the
    reference stores conj(Y) in sh_s_ and conjugates it back here).
    Output is applied as ``y = w^H X`` (zdotc, cc:2181-2228).  Returns [F, C].
    """
    C = Y_matrix.shape[1]
    F = b.shape[0]
    w = np.zeros((F, C), np.complex128)
    for idx, (n, m) in enumerate(sh_index_pairs(max_order)):
        Y0c = np.conj(spherical_harmonic(m, n, theta, phi))
        w += (_i_pow(n) * b[:, n])[:, None] * (Y_matrix[idx] * Y0c)[None, :]
    return 4.0 * np.pi / C * w


def spherical_diffuse_coherence(max_order: int, b: np.ndarray, Y_matrix: np.ndarray,
                                sigma2: float = 0.01) -> np.ndarray:
    """Diffuse-field coherence of a rigid-sphere array,
    ``Sigma_SI = A diag(|b_n|^2) A^H + sigma^2 I`` with ``A[c, idx] =
    Y_n^m(Omega_c)`` (SphericalSpatialHWNCBeamformer::calc_diffuse_noise_model_,
    modalbeamformer.cc:2305-2356).  Returns [F, C, C]."""
    A = Y_matrix.T  # [C, dim]
    pairs = sh_index_pairs(max_order)
    bn2 = np.stack([np.abs(b[:, n]) ** 2 for n, _ in pairs], axis=-1)  # [F, dim]
    Sigma = np.einsum("cd,fd,ed->fce", A, bn2, np.conj(A))
    C = A.shape[0]
    return Sigma + sigma2 * np.eye(C)[None]


def spherical_spatial_hwnc_weights(max_order: int, b: np.ndarray, Y_matrix: np.ndarray,
                                   theta: float, phi: float, sigma2: float = 0.01,
                                   ratio: float = 0.0) -> np.ndarray:
    """Element-space white-noise-gain-constrained MVDR against the spherical
    diffuse-noise model (SphericalSpatialHWNCBeamformer::calc_weights_,
    modalbeamformer.cc:2358-2436):

        v = spatial D&S steering (unit norm);  w = Sigma^-1 v / (v^H Sigma^-1 v)

    then scaled by ``2 sqrt(pi / (C wng))`` with the WNG table of calc_wng
    (cc:1400-1430) when ``ratio > 0``, else by ``16 pi^2 / (C maxOrder^2)``.
    Returns [F, C]; applied as ``y = w^H X``.
    """
    C = Y_matrix.shape[1]
    v = spherical_spatial_ds_weights(max_order, b, Y_matrix, theta, phi)
    v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    Sigma = spherical_diffuse_coherence(max_order, b, Y_matrix, sigma2)
    iSv = np.linalg.solve(Sigma, v[..., None])[..., 0]  # [F, C]
    lam = np.einsum("fc,fc->f", np.conj(v), iSv)
    w = iSv / lam[:, None]
    if ratio > 0.0:
        pairs_n = np.arange(max_order)
        wng = (C / (16 * np.pi**2)) * ratio * np.sum(
            (2 * pairs_n + 1)[None, :] * np.abs(b) ** 2, axis=-1
        )
        w *= (2.0 * np.sqrt(np.pi / (C * np.maximum(wng, 1e-20))))[:, None] / np.maximum(
            np.linalg.norm(w, axis=-1, keepdims=True), 1e-20
        )
    else:
        w *= (16.0 * np.pi**2) / (C * max_order * max_order)
    return w


def spherical_moen_weights(max_order: int, b: np.ndarray, Y_matrix: np.ndarray,
                           theta: float, phi: float, diagonal_weight=0.0,
                           bf_order: int | None = None) -> np.ndarray:
    """Minimum-mean-squared-error ("MOEN") spherical beamformer in element
    space (SphericalMOENBeamformer::calc_weights_/calc_moen_weights_,
    modalbeamformer.cc:1946-2052):

        A[idx, c] = 4 pi conj(Y_n^m(Omega_c)) i^n b_n(ka)
        BN[idx]   = 2 pi conj(Y_n^m(look)),   n < bf_order
        w         = C_N (A^H A + lambda I)^+ A^H BN,   C_N = 2 / maxOrder^2

    Returns [F, C] *conjugated* so that the framework-wide application
    ``y = w^H X`` realizes the unconjugated combination ``sum_c w_c X_c``
    that the reference's own ``beampattern()`` (cc:2075-2111, zdotu) uses —
    the zdotc in its ``next()`` contradicts its beampattern and does not
    steer to the look direction.  ``diagonal_weight``: scalar or per-bin [F].
    """
    C = Y_matrix.shape[1]
    F = b.shape[0]
    dim = max_order * max_order
    if bf_order is None:
        bf_order = max_order
    pairs = sh_index_pairs(max_order)
    A = np.zeros((F, dim, C), np.complex128)
    BN = np.zeros(dim, np.complex128)
    for idx, (n, m) in enumerate(pairs):
        A[:, idx, :] = 4 * np.pi * np.conj(Y_matrix[idx])[None, :] * (
            _i_pow(n) * b[:, n]
        )[:, None]
        if n < bf_order:
            BN[idx] = 2 * np.pi * np.conj(spherical_harmonic(m, n, theta, phi))
    lam = np.broadcast_to(np.asarray(diagonal_weight, np.float64), (F,))
    AH = np.conj(np.swapaxes(A, -1, -2))  # [F, C, dim]
    G = AH @ A + lam[:, None, None] * np.eye(C)[None]
    AH_BN = AH @ BN  # [F, C]
    CN = 2.0 / (max_order * max_order)
    # G = A^H A (+ lambda I) is rank-deficient whenever dim < C (A is
    # [dim, C]), so the reference inverts it with a singular-value
    # THRESHOLDED pseudoinverse (pseudoinverse(), beamformer.cc:232-289,
    # dthreshold_ = 1e-8) — a plain solve would blow up on the null space.
    Ginv = np.linalg.pinv(G, rcond=1e-8, hermitian=True)
    return np.conj(CN * np.einsum("fcd,fd->fc", Ginv, AH_BN))


def dual_spherical_ds_weights(max_order: int, b: np.ndarray, theta: float, phi: float,
                              mpos_mm: np.ndarray, fftlen: int, samplerate: float,
                              normalize: bool = False, wgain: float = 1.0):
    """SH-domain spherical D&S weights plus the matched element-space
    delay-and-sum weights (DualSphericalDSBeamformer::calc_weights_,
    modalbeamformer.cc:1164-1230: keeps a second BeamformerWeights with a
    plain time-delay beamformer for postfilter estimation).

    ``mpos_mm``: [C, 3] cartesian sensor positions (mm).  Returns
    (w_sh [F, dim], w_elem [F, C]).
    """
    from .beamforming import array_manifold

    w_sh = spherical_ds_weights(max_order, b, theta, phi, normalize, wgain)
    # unit vector towards (theta, phi), delays tau_c = -<u, p_c>/c
    u = np.array([
        np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)
    ])
    tau = -np.asarray(mpos_mm, np.float64) @ u / SSPEED_MM_S
    vs = np.asarray(array_manifold(fftlen, samplerate, tau))  # already 1/C-scaled
    return w_sh, np.conj(vs)


def spherical_hwnc_gsc_weights(max_order: int, b: np.ndarray, theta: float, phi: float,
                               num_sensors: int, sigma2: float = 0.01,
                               ratio: float = 0.0, Nc: int = 1):
    """SH-domain GSC whose quiescent branch is the WNG-constrained
    eigenbeamformer (SphericalHWNCGSCBeamformer, modalbeamformer.cc:1690-1816).
    Returns (wqH [F, dim], BmH [F, dim-Nc, dim])."""
    from .beamforming import blocking_matrix

    w = hwnc_weights(max_order, b, theta, phi, num_sensors, sigma2, ratio)
    vs = jnp.asarray(np.conj(w), jnp.complex64)
    B = blocking_matrix(vs, Nc)
    return np.conj(np.asarray(vs)), np.swapaxes(np.asarray(B), -1, -2)
