"""Speaker tracking: Kalman / extended / iterated-extended Kalman filters.

Batched-over-frames reformulation of the reference trackers
(lib/pykalman.py): the per-frame predict/gate/update recursion is a
`lax.scan`; the variable-length TDOA observation lists become fixed-size
masked vectors (pair mask zeroes the corresponding Jacobian rows and
innovation entries, which decouples them exactly).

Replicated details: innovation gating via the chi CDF of the Mahalanobis
distance (pykalman.py:96-106 — note the reference uses scipy.stats.chi, not
chi2; kept), elapsed-time-scaled process noise (update, pykalman.py:141-163),
spherical boundary wrap-around (adjust_boundaries, pykalman.py:115-139), and
the IEKF local iterations with fixed linearization (pykalman.py:219-266).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .localization import pair_tdoa_jacobian, pair_tdoa_model

__all__ = ["TrackerConfig", "kalman_track", "ekf_track", "iekf_track"]


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    sigmaV2: float = 1.0e-4
    sigmaK2: float = 1.0e-2
    time_delta: float = 1.0
    gate_prob: float = 0.0
    num_iterations: int = 1  # >1 = IEKF
    iteration_threshold: float = 1.0e-4
    adjust_spherical: bool = False  # theta/phi wrap (pykalman.py:115-139)


def _chi_cdf(x, df):
    """scipy.stats.chi.cdf(x, df) = P(df/2, x^2/2) via the regularized
    incomplete gamma function."""
    return jax.scipy.special.gammainc(df / 2.0, (x * x) / 2.0)


def _adjust_spherical(x):
    theta = x[0]
    phi = jnp.where(x.shape[0] > 1, x[1], 0.0) if x.shape[0] > 1 else jnp.asarray(0.0)
    flip_low = theta < 0.0
    flip_high = theta > jnp.pi
    theta = jnp.where(flip_low, -theta, jnp.where(flip_high, theta - jnp.pi, theta))
    phi = jnp.where(flip_low | flip_high, phi + jnp.pi, phi)
    phi = jnp.mod(phi + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    out = x.at[0].set(theta)
    if x.shape[0] > 1:
        out = out.at[1].set(phi)
    return out


class _TrackState(NamedTuple):
    xk: jax.Array  # [D] filtered state
    K: jax.Array  # [D, D] filtered covariance
    last_update: jax.Array  # scalar float (frame of last accepted update)
    time: jax.Array  # scalar float


def _masked_update(cfg: TrackerConfig, F_mat, U, state, xk_predict, H, yk_lin, mask):
    """Gated masked Kalman correction shared by all trackers.

    H: [P, D] with invalid rows zeroed; yk_lin: [P] linearized observation;
    mask: [P] validity.  Returns (accepted, xk_filter, K_filter, G, S terms).
    """
    D = state.xk.shape[0]
    P = yk_lin.shape[0]
    elapsed = (state.time - state.last_update) * cfg.time_delta
    K_predict = F_mat @ state.K @ F_mat.T + (elapsed * elapsed) * U

    Hm = jnp.where(mask[:, None], H, 0.0)
    S = Hm @ K_predict @ Hm.T + cfg.sigmaV2 * jnp.eye(P)
    Sinv = jnp.linalg.inv(S)
    yk_hat = Hm @ xk_predict
    s = jnp.where(mask, yk_lin - yk_hat, 0.0)

    if cfg.gate_prob > 0.0:
        df = jnp.sum(mask).astype(jnp.float32)
        d2 = s @ (Sinv @ s)
        rejected = _chi_cdf(d2, jnp.maximum(df, 1.0)) > cfg.gate_prob
    else:
        rejected = jnp.asarray(False)

    G = K_predict @ Hm.T @ Sinv

    if cfg.num_iterations <= 1:
        xk_filter = xk_predict + G @ s
    else:
        # IEKF local iterations with fixed H (pykalman.py:241-262)
        def iter_body(carry, _):
            eta, first = carry
            zeta = jnp.where(first, s, s - Hm @ (xk_predict - eta))
            eta_new = xk_predict + G @ zeta
            return (eta_new, jnp.asarray(False)), None

        (xk_filter, _), _ = jax.lax.scan(
            iter_body, (xk_predict, jnp.asarray(True)), None, length=cfg.num_iterations
        )

    if cfg.adjust_spherical:
        xk_filter = _adjust_spherical(xk_filter)
    K_filter = (jnp.eye(D) - G @ Hm) @ K_predict

    accepted = jnp.logical_not(rejected)
    return accepted, xk_filter, K_filter


def _make_tracker(cfg: TrackerConfig, F_mat, U, linearize_fn):
    """Build the scan step.  ``linearize_fn(xk_predict, obs) -> (H, yk_lin)``
    or None for a linear KF with fixed H."""

    F_mat = jnp.asarray(F_mat, jnp.float32)
    U = jnp.asarray(U, jnp.float32)

    def step(state: _TrackState, inputs):
        obs, mask, frame_valid = inputs
        xk_predict = F_mat @ state.xk
        H, yk_lin = linearize_fn(xk_predict, obs)
        accepted, xk_f, K_f = _masked_update(
            cfg, F_mat, U, state, xk_predict, H, yk_lin, mask
        )
        do = frame_valid & accepted
        new = _TrackState(
            xk=jnp.where(do, xk_f, state.xk),
            K=jnp.where(do, K_f, state.K),
            last_update=jnp.where(do, state.time, state.last_update),
            time=state.time + 1.0,
        )
        return new, new.xk

    return step


# `_run` marks linearize_fn static, so its jit cache is keyed on the
# FUNCTION OBJECT's identity: a fresh closure per call would force a full
# retrace+compile every invocation.  Memoize the linearizers on their data.
_LIN_CACHE: dict = {}


def _cached_lin(key, builder):
    fn = _LIN_CACHE.get(key)
    if fn is None:
        fn = builder()
        _LIN_CACHE[key] = fn
    return fn


@partial(jax.jit, static_argnums=(0, 5))
def _run(cfg, F_mat, U, initialX, inputs, linearize_fn):
    D = np.shape(F_mat)[0]
    state0 = _TrackState(
        xk=jnp.asarray(initialX, jnp.float32),
        K=cfg.sigmaK2 * jnp.eye(D),
        last_update=jnp.asarray(-1.0),
        time=jnp.asarray(0.0),
    )
    step = _make_tracker(cfg, F_mat, U, linearize_fn)
    _, track = jax.lax.scan(step, state0, inputs)
    return track


def kalman_track(cfg: TrackerConfig, F_mat, U, H, initialX, yk, mask, frame_valid):
    """Linear Kalman filter over an observation sequence.

    ``yk``: [T, P]; ``mask``: [T, P]; ``frame_valid``: [T].
    Returns the state track [T, D].
    """
    H_np = np.asarray(H, np.float32)

    def build():
        Hj = jnp.asarray(H_np)

        def lin(xk_predict, obs):
            return Hj, obs

        return lin

    lin = _cached_lin(("kf", H_np.tobytes(), H_np.shape), build)
    return _run(cfg, F_mat, U, initialX, (jnp.asarray(yk, jnp.float32), mask, frame_valid), lin)


def ekf_track(cfg: TrackerConfig, F_mat, U, initialX, mpos, pairs, delays, mask, frame_valid):
    """EKF on TDOA observations (ExtendedKalmanFilter, pykalman.py:186-215).

    ``delays``: [T, P] measured pair TDOAs; linearization about the predicted
    position per frame: ``y_lin = y - (tdoa(x_pred) - H x_pred)``.
    """
    mpos = np.asarray(mpos, dtype=np.float64)
    pairs = tuple(tuple(p) for p in pairs)

    def build():
        def lin(xk_predict, obs):
            H = pair_tdoa_jacobian(xk_predict, mpos, pairs)
            pred = pair_tdoa_model(xk_predict, mpos, pairs)
            y_lin = obs - (pred - H @ xk_predict)
            return H, y_lin

        return lin

    lin = _cached_lin(("ekf", mpos.tobytes(), mpos.shape, pairs), build)
    return _run(cfg, F_mat, U, initialX, (jnp.asarray(delays, jnp.float32), mask, frame_valid), lin)


def iekf_track(cfg: TrackerConfig, F_mat, U, initialX, mpos, pairs, delays, mask, frame_valid):
    """Iterated EKF (IteratedExtendedKalmanFilter, pykalman.py:219-266)."""
    if cfg.num_iterations <= 1:
        cfg = dataclasses.replace(cfg, num_iterations=3)
    return ekf_track(cfg, F_mat, U, initialX, mpos, pairs, delays, mask, frame_valid)


def fflinear_ekf_track(cfg: TrackerConfig, F_mat, U, initial_azimuth, mpos, pairs,
                       delays, mask, frame_valid, c: float = 343000.0):
    """Far-field linear-array azimuth tracking (1-D state)
    (FarfieldLinearArrayTDOAFeatureVector, pytdoa.py:332-420): pair model
    ``tau = d_pair cos(az) / c`` with Jacobian ``-d_pair sin(az) / c``.

    ``mpos``: [C, >=1] positions; distances are measured along the array from
    sensor 0 as the reference does (collinearity projection).
    """
    mpos = np.asarray(mpos, dtype=np.float64)
    d0 = np.linalg.norm(mpos - mpos[0], axis=-1)
    pairs = tuple(tuple(p) for p in pairs)
    dists_np = np.asarray([d0[j] - d0[i] for (i, j) in pairs], np.float32)

    def build():
        dists = jnp.asarray(dists_np)

        def lin(xk_predict, obs):
            az = xk_predict[0]
            pred = dists * jnp.cos(az) / c
            H = (-dists * jnp.sin(az) / c)[:, None]
            y_lin = obs - (pred - H[:, 0] * az)
            return H, y_lin

        return lin

    lin = _cached_lin(("fflin", dists_np.tobytes(), float(c)), build)
    return _run(
        cfg,
        jnp.asarray(F_mat, jnp.float32).reshape(1, 1),
        jnp.asarray(U, jnp.float32).reshape(1, 1),
        jnp.atleast_1d(jnp.asarray(initial_azimuth, jnp.float32)),
        (jnp.asarray(delays, jnp.float32), mask, frame_valid),
        lin,
    )
