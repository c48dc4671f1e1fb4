"""Spherical-array speaker tracking in the SH domain.

Reference-exact batched reformulation of the reference's spherical tracker
(beamformer/tracker.cc: BaseDecomposition/ModalDecomposition +
BaseSphericalArrayTracker/ModalSphericalArrayTracker): per frame,

  1. the 32-channel snapshot is SH-transformed (transform, tracker.cc:680),
  2. per-subband source amplitudes ``B_kl = g^H v / |g|^2`` are estimated at
     the current state with ``g = 4 pi i^n b_n(ka) Ybar_n^m(theta, phi)``
     (estimate_Bkl, tracker.cc:623-678),
  3. the ``useSubbandsN`` strongest ``|B_kl|`` are selected
     (SubbandList, tracker.h:59-101),
  4. the linearized observation model ``H = B dg + g dB`` (linearize,
     tracker.cc:682-708) drives a square-root EKF update (update_ /
     lower_triangularize_, tracker.cc:1081-1250) — realized here in the
     algebraically identical covariance form over real-stacked re/im rows.

Reference quirks replicated exactly (verified against the COMPILED C++
tracker trajectory, tests/test_cpp_golden.py::test_spherical_tracker_matches_cpp):

- the initial state covariance sqrt is ``sqrt(sigma_init)`` with
  ``sigma_init = sqrt(sigma2_init)`` (ctor, tracker.cc:886), so
  ``P0 = sqrt(sigma2_init) I`` — NOT sigma2_init;
- process noise is rotated into the NEXT frame's prior inside the
  post-array, so the first update runs on P0 with no sigma2_u added;
- ``dB_kl/dtheta`` uses the reference's literal ``ddelta_dtheta``
  expression ``sum -32 (pi norm |bn|)^2 Pnm dPnm_dx sin(theta)``
  (tracker.cc:648-660) — 16 pi^2 times the true derivative of |g|^2, a
  reference quirk kept for parity;
- the polar angle is clamped to [0.01, pi - 0.01]
  (check_physical_constraints_, Epsilon_); the azimuth is NOT wrapped.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from math import factorial

import jax
import jax.numpy as jnp
import numpy as np

from .spherical import (
    mode_amplitudes,
    sh_index_pairs,
    spherical_harmonics_matrix,
)

__all__ = ["SphericalTrackerConfig", "spherical_track", "make_tracker_tables"]

EPSILON = 0.01  # BaseSphericalArrayTracker::Epsilon_ (tracker.cc:856)


@dataclasses.dataclass(frozen=True)
class SphericalTrackerConfig:
    max_order: int = 3
    num_subbands_used: int = 8  # K strongest |B_kl| (useSubbandsN)
    sigmaV2: float = 1.0e-2  # sigma2_v observation noise
    sigmaK2: float = 1.0e-2  # sigma2_init (P0 = sqrt(sigma2_init) I, [sic])
    sigmaU2: float = 1.0e-4  # sigma2_u process noise
    gate_prob: float = 0.0  # unused; kept for API compatibility


def _legendre_signed(max_order: int, x, s):
    """Signed-degree associated Legendre values P_n^m(x) for all
    (n, m), n <= max_order (inclusive), with Condon-Shortley — the
    reference's calc_Pnm_ (gsl_sf_legendre_Plm + the negative-degree
    factor, tracker.cc:411-427).  Returns dict[(n, m)] of arrays."""
    P = {}
    P[(0, 0)] = jnp.ones_like(x)
    for n in range(1, max_order + 1):
        P[(n, n)] = -(2 * n - 1) * s * P[(n - 1, n - 1)]
        P[(n, n - 1)] = (2 * n - 1) * x * P[(n - 1, n - 1)]
    for n in range(2, max_order + 1):
        for m in range(0, n - 1):
            P[(n, m)] = ((2 * n - 1) * x * P[(n - 1, m)]
                         - (n - 1 + m) * P[(n - 2, m)]) / (n - m)
    for n in range(max_order + 1):
        for m in range(1, n + 1):
            sign = -1.0 if m % 2 else 1.0
            P[(n, -m)] = sign * (factorial(n - m) / factorial(n + m)) * P[(n, m)]
    return P


def _norm_nm(n, m):
    """calc_normalization_ (tracker.cc:397-408): sqrt((2n+1)/4pi)
    sqrt((n-|m|)!/(n+|m|)!), negated for odd negative degrees."""
    am = abs(m)
    norm = np.sqrt((2 * n + 1) / (4 * np.pi)
                   * factorial(n - am) / factorial(n + am))
    if m < 0 and am % 2 == 1:
        norm = -norm
    return norm


def _sh_eval(max_order: int, theta, phi):
    """Differentiable Y_n^m(theta, phi) for all (n, m) -> [dim] complex
    (standard convention, e^{+i m phi}; the reference's ``harmonic`` is the
    conjugate)."""
    x = jnp.cos(theta)
    s = jnp.sin(theta)
    P = _legendre_signed(max_order - 1, x, s)
    vals = []
    for n, m in sh_index_pairs(max_order):
        p = _norm_nm(n, abs(m)) * P[(n, abs(m))]
        if m < 0 and abs(m) % 2 != 0:
            p = -p
        vals.append(p * jnp.exp(1j * m * phi))
    return jnp.stack(vals)


def _model_tables(max_order: int, theta, phi):
    """Ybar, dYbar/dtheta, dYbar/dphi and the quirky ddelta weights at one
    state point, for all (n, m) pairs up to ``max_order`` (exclusive, the
    `sh_index_pairs` convention).

    The reference's ACTIVE ``calc_normalization_`` (the ``#if 1`` branch,
    tracker.cc:368-393) uses the RECIPROCAL factorial ratio for negative
    degrees; composed with the signed-degree ``calc_Pnm_`` /
    ``calc_dPnm_dtheta_`` the r-factors cancel exactly, so the net
    harmonic/derivative values live in the positive-degree (sphPlm)
    convention with only the odd-negative sign — verified term by term
    against the compiled tracker_lin dump to 1e-16.  The one surviving
    quirk is estimate_Bkl's ``ddelta_dtheta`` magnitude
    (``-32 (pi norm |bn|)^2 P dP sin``, tracker.cc:648-660 — 16 pi^2
    times the true d|g|^2/dtheta), reproduced literally."""
    x = jnp.cos(theta)
    s = jnp.sin(theta)
    # positive-degree P up to order max_order (need n+1 rows for dPnm_dx)
    P = _legendre_signed(max_order, x, s)
    pairs = sh_index_pairs(max_order)
    Ybar, dYt, dYp, Pv, dPdx, norms = [], [], [], [], [], []
    for n, m in pairs:
        am = abs(m)
        s_odd = -1.0 if (m < 0 and am % 2 == 1) else 1.0
        N_pos = _norm_nm(n, am)
        e = jnp.exp(-1j * m * phi)
        Pnm = P[(n, am)]
        dP = ((am - n - 1) * P[(n + 1, am)] + (n + 1) * x * Pnm) / (1.0 - x * x)
        Y = s_odd * N_pos * Pnm * e
        Ybar.append(Y)
        dYt.append(s_odd * (-N_pos * dP * s) * e)
        dYp.append(Y * (-1j * m))
        Pv.append(Pnm)
        dPdx.append(dP)
        norms.append(N_pos)
    return (jnp.stack(Ybar), jnp.stack(dYt), jnp.stack(dYp),
            jnp.stack(Pv), jnp.stack(dPdx), jnp.asarray(norms))


@partial(jax.jit, static_argnums=(0,))
def spherical_track(
    cfg: SphericalTrackerConfig,
    X: jax.Array,
    Y_matrix: jax.Array,
    bn4pi: jax.Array,
    initial_state,
):
    """Track (theta, phi) over frames of rigid-sphere snapshots.

    ``X``: [T, F, C] snapshots; ``Y_matrix``: [dim, C] sensor SH matrix;
    ``bn4pi``: [F, order] = 4 pi i^n b_n(ka) (BaseDecomposition ctor,
    tracker.cc:95-104); ``initial_state``: (theta0, phi0).
    Returns the state track [T, 2] (the reference's per-frame ``position_``
    stream output).  Runs in the dtype of ``X`` (float64 inputs reproduce
    the double-precision C++ trajectory; see the golden test).
    """
    dim = Y_matrix.shape[0]
    max_order = int(np.sqrt(dim))
    n_of = jnp.asarray([n for n, m in sh_index_pairs(max_order)])
    K = cfg.num_subbands_used
    real_t = jnp.real(jnp.zeros((), X.dtype)).dtype

    shc = jnp.conj(jnp.asarray(Y_matrix, X.dtype))
    bn4pi = jnp.asarray(bn4pi, X.dtype)

    def step(carry, Xt):
        state, P = carry
        theta, phi = state[0], state[1]
        v = jnp.einsum("dc,fc->fd", shc, Xt)  # SH transform [F, dim]

        Ybar, dYt, dYp, Pv, dPdx, norms = _model_tables(
            max_order, theta, phi)
        bn_sel_all = bn4pi[:, n_of]  # [F, dim]
        g = bn_sel_all * Ybar[None, :]       # [F, dim]
        dg_t = bn_sel_all * dYt[None, :]
        dg_p = bn_sel_all * dYp[None, :]

        eta = jnp.sum(jnp.conj(g) * v, axis=-1)       # [F]
        delta = jnp.sum(jnp.abs(g) ** 2, axis=-1)
        delta = jnp.maximum(delta, 1e-30)
        Bkl = eta / delta

        # derivative terms (estimate_Bkl, incl. the quirky ddelta_dtheta)
        deta_t = jnp.sum(jnp.conj(dg_t) * v, axis=-1)
        deta_p = jnp.sum(jnp.conj(dg_p) * v, axis=-1)
        norm2 = (np.pi * norms)[None, :] * jnp.abs(bn_sel_all)  # [F, dim]
        ddelta_t = jnp.sum(
            -32.0 * norm2 * norm2 * Pv[None, :] * dPdx[None, :]
            * jnp.sin(theta), axis=-1)
        dB_t = (deta_t * delta - eta * ddelta_t) / (delta * delta)
        dB_p = deta_p / delta

        # strongest-K subbands (SubbandList sort by |B_kl| descending)
        _, sel = jax.lax.top_k(jnp.abs(Bkl), K)
        v_sel = v[sel]
        B = Bkl[sel][:, None]
        Hc_t = B * dg_t[sel] + g[sel] * dB_t[sel][:, None]  # [K, dim]
        Hc_p = B * dg_p[sel] + g[sel] * dB_p[sel][:, None]
        yhat = g[sel] * B

        resid_c = (v_sel - yhat).reshape(-1)
        resid = jnp.concatenate([jnp.real(resid_c), jnp.imag(resid_c)])
        Hc = jnp.stack([Hc_t.reshape(-1), Hc_p.reshape(-1)], axis=-1)
        H = jnp.concatenate([jnp.real(Hc), jnp.imag(Hc)], axis=0)

        # covariance-form equivalent of update_/lower_triangularize_:
        # process noise joins the NEXT prior (post-array A22' includes U)
        S = H @ P @ H.T + cfg.sigmaV2 * jnp.eye(H.shape[0], dtype=real_t)
        G = jnp.linalg.solve(S, H @ P)  # [2K dim * 2, 2]
        state_new = state + G.T @ resid
        P_post = P - G.T @ (H @ P)
        P_next = P_post + cfg.sigmaU2 * jnp.eye(2, dtype=real_t)

        # check_physical_constraints_: clamp theta, leave phi
        theta_n = jnp.clip(state_new[0], EPSILON, jnp.pi - EPSILON)
        state_new = jnp.stack([theta_n, state_new[1]])
        return (state_new, P_next), state_new

    state0 = jnp.asarray(initial_state, real_t)
    # [sic] K_k_k1 = sqrt(sigma_init) I with sigma_init = sqrt(sigma2_init)
    P0 = jnp.sqrt(jnp.asarray(cfg.sigmaK2, real_t)) * jnp.eye(2, dtype=real_t)
    (_, _), track = jax.lax.scan(step, (state0, P0), X)
    return track


def tracker_mode_amplitudes(max_order: int, ka) -> np.ndarray:
    """The tracker's own rigid-sphere modal coefficients b_n(ka)
    (BaseDecomposition::modal_coefficient, tracker.cc:464-580) — literal
    double-precision transcription of its per-order closed forms (they
    differ numerically from models/spherical.mode_amplitudes' formulation,
    so the golden-exact tracker needs this table).  ``ka``: [F] -> [F,
    max_order] complex128 for orders 0..max_order-1; ka == 0 -> 1."""
    ka = np.asarray(ka, np.float64)
    out = np.ones((len(ka), max_order), np.complex128)
    nz = ka != 0.0
    x = ka[nz]
    for n in range(max_order):
        if n == 0:
            j0 = np.sinc(x / np.pi)
            h0 = j0 - 1j * np.cos(x) / x
            grad = (x * np.cos(x) - np.sin(x)) / ((x + 1j) * np.exp(1j * x))
            bn = j0 - grad * h0
        elif n == 1:
            bn = x * (-np.cos(x) + 1j * np.sin(x)) / ((x * x - 2) + 2j * x)
        elif n == 2:
            bn = 1j * x**2 * (np.cos(x) - 1j * np.sin(x)) / (
                (x**3 - 9 * x) + 1j * (4 * x**2 - 9))
        elif n == 3:
            bn = x**3 * (np.cos(x) - 1j * np.sin(x)) / (
                (x**4 - 27 * x**2 + 60) + 1j * (7 * x**3 - 60 * x))
        elif n == 4:
            bn = x**4 * (np.sin(x) + 1j * np.cos(x)) / (
                (x**5 - 65 * x**3 + 525 * x)
                + 1j * (11 * x**4 - 240 * x**2 + 525))
        elif n == 5:
            bn = x**5 * (np.cos(x) - 1j * np.sin(x)) / (
                (x**6 - 135 * x**4 + 2625 * x**2 - 5670)
                + 1j * (16 * x**5 - 735 * x**3 + 5670 * x))
        elif n == 6:
            bn = 1j * x**6 * (np.cos(x) - 1j * np.sin(x)) / (
                (x**7 - 252 * x**5 + 9765 * x**3 - 72765 * x)
                + 1j * (22 * x**6 - 1890 * x**4 + 34020 * x**2 - 72765))
        elif n == 7:
            bn = x**7 * (np.cos(x) - 1j * np.sin(x)) / (
                (1081080 - 509355 * x**2 + 29925 * x**4 - 434 * x**6 + x**8)
                + 1j * (-1081080 * x + 148995 * x**3 - 4284 * x**5
                        + 29 * x**7))
        elif n == 8:
            bn = x**8 * (np.sin(x) + 1j * np.cos(x)) / (
                (18243225 * x - 2567565 * x**3 + 79695 * x**5 - 702 * x**7
                 + x**9)
                + 1j * (18243225 - 8648640 * x**2 + 530145 * x**4
                        - 8820 * x**6 + 37 * x**8))
        else:
            # Bessel fallback (tracker.cc default branch)
            from scipy.special import spherical_jn, spherical_yn

            jn = spherical_jn(n, x)
            yn = spherical_yn(n, x)
            hn = jn + 1j * yn
            jn_p, jn_n = spherical_jn(n - 1, x), spherical_jn(n + 1, x)
            yn_p, yn_n = spherical_yn(n - 1, x), spherical_yn(n + 1, x)
            djn = (jn_p - jn_n) / 2
            hn_p = jn_p + 1j * yn_p
            hn_n = jn_n + 1j * yn_n
            val = (hn + hn_n * x) / x
            dhn = (hn_p - val) * 0.5
            bn = jn - (djn / dhn) * hn
        out[nz, n] = bn
    return out


def make_tracker_tables(max_order: int, ka, theta_s, phi_s,
                        dtype=np.complex64):
    """Precompute (Y_matrix [dim, C], bn4pi [F, order]) for `spherical_track`.

    Uses the tracker's own `tracker_mode_amplitudes` b_n table (NOT
    models/spherical.mode_amplitudes, whose formulation differs numerically
    — the per-subband Bkl estimates would drift from the reference)."""
    Y = spherical_harmonics_matrix(max_order, theta_s, phi_s)
    b = tracker_mode_amplitudes(max_order, np.asarray(ka))
    i_pow = np.array([(1j) ** (n % 4) for n in range(max_order)])
    bn4pi = 4 * np.pi * i_pow[None, :] * b
    return Y.astype(dtype), bn4pi.astype(dtype)
