"""Spherical-array speaker tracking in the SH domain.

Batched reformulation of the reference's spherical tracker
(beamformer/tracker.cc: BaseDecomposition/ModalDecomposition +
BaseSphericalArrayTracker): per frame, the snapshot's SH coefficients are
projected onto the steered modal model ``G_nm(theta, phi) = 4 pi i^n b_n
Y_n^m(theta, phi)`` to estimate per-subband source amplitudes ``B_kl``
(estimate_Bkl, tracker.cc:623-678), and an EKF updates the direction state
``(theta, phi)`` from the linearized complex observations.

The reference hand-derives the SH derivatives and runs a square-root EKF
with Givens rotations (update_, lower_triangularize_); here jax.jacfwd
supplies the exact Jacobian and the masked-EKF machinery of
models/tracking.py performs the (equivalent) covariance-form update with
real/imaginary stacking.  Subband selection: the K strongest |B_kl| per
frame (SubbandList, tracker.h:59-101).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spherical import (
    mode_amplitudes,
    sh_index_pairs,
    spherical_harmonics_matrix,
)

__all__ = ["SphericalTrackerConfig", "spherical_track"]


@dataclasses.dataclass(frozen=True)
class SphericalTrackerConfig:
    max_order: int = 3
    num_subbands_used: int = 8  # K strongest |B_kl|
    sigmaV2: float = 1.0e-2
    sigmaK2: float = 1.0e-2
    sigmaU2: float = 1.0e-4
    gate_prob: float = 0.0


def _sh_eval(max_order: int, theta, phi):
    """Differentiable Y_n^m(theta, phi) for all (n, m) -> [dim] complex.

    Built from closed-form associated Legendre polynomials up to the order
    (jax-traceable; orders used by the tracker are small).
    """
    x = jnp.cos(theta)
    s = jnp.sin(theta)
    from math import factorial

    vals = []
    # iterative associated Legendre with Condon-Shortley, P[n][m]
    P = {}
    P[(0, 0)] = jnp.ones_like(x)
    for n in range(1, max_order):
        P[(n, n)] = -(2 * n - 1) * s * P[(n - 1, n - 1)]
        P[(n, n - 1)] = (2 * n - 1) * x * P[(n - 1, n - 1)]
    for n in range(2, max_order):
        for m in range(0, n - 1):
            P[(n, m)] = ((2 * n - 1) * x * P[(n - 1, m)] - (n - 1 + m) * P[(n - 2, m)]) / (n - m)
    for n, m in sh_index_pairs(max_order):
        am = abs(m)
        norm = np.sqrt((2 * n + 1) / (4 * np.pi) * factorial(n - am) / factorial(n + am))
        p = norm * P[(n, am)]
        if m < 0 and am % 2 != 0:
            p = -p
        vals.append(p * jnp.exp(1j * m * phi))
    return jnp.stack(vals)


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
    Returns the state track [T, 2].
    """
    dim = Y_matrix.shape[0]
    max_order = int(np.sqrt(dim))
    n_of = jnp.asarray([n for n, m in sh_index_pairs(max_order)])
    K = cfg.num_subbands_used

    shc = jnp.conj(jnp.asarray(Y_matrix, jnp.complex64))

    def model_G(state, bn_sel):
        """G [K, dim] for the selected subbands' modal coefficients."""
        theta, phi = state[0], state[1]
        # conj(Y) so the model lives in the same (conjugated) SH-analysis
        # domain as the transform above (spherical_component_ = conj(Y),
        # tracker.cc:108-117)
        Y = jnp.conj(_sh_eval(max_order, theta, phi))  # [dim]
        return bn_sel[:, n_of] * Y[None, :]  # [K, dim]

    def step(carry, Xt):
        state, P = carry
        v = jnp.einsum("dc,fc->fd", shc, Xt)  # SH transform [F, dim]

        # B_kl with the predicted state (estimate_Bkl)
        G_all = jnp.asarray(bn4pi)[:, n_of] * jnp.conj(_sh_eval(max_order, state[0], state[1]))[None, :]
        eta = jnp.sum(jnp.conj(G_all) * v, axis=-1)
        delta = jnp.sum(jnp.abs(G_all) ** 2, axis=-1)
        Bkl = eta / jnp.maximum(delta, 1e-20)  # [F]

        # strongest-K subbands
        _, sel = jax.lax.top_k(jnp.abs(Bkl), K)
        v_sel = v[sel]  # [K, dim]
        B_sel = Bkl[sel]
        bn_sel = jnp.asarray(bn4pi)[sel]

        def yhat_flat(s):
            G = model_G(s, bn_sel)
            y = (G * B_sel[:, None]).reshape(-1)
            return jnp.concatenate([jnp.real(y), jnp.imag(y)])

        y_obs = v_sel.reshape(-1)
        y_obs = jnp.concatenate([jnp.real(y_obs), jnp.imag(y_obs)])

        H = jax.jacfwd(yhat_flat)(state)  # [2*K*dim, 2]
        resid = y_obs - yhat_flat(state)

        P_pred = P + cfg.sigmaU2 * jnp.eye(2)
        S = H @ P_pred @ H.T + cfg.sigmaV2 * jnp.eye(H.shape[0])
        Ginv = jnp.linalg.solve(S, H @ P_pred)
        state_new = state + Ginv.T @ resid
        P_new = P_pred - Ginv.T @ (H @ P_pred)

        # spherical wrap (adjust_boundaries semantics)
        theta = state_new[0]
        phi = state_new[1]
        flip = theta < 0.0
        theta = jnp.where(flip, -theta, theta)
        phi = jnp.where(flip, phi + jnp.pi, phi)
        flip2 = theta > jnp.pi
        theta = jnp.where(flip2, 2 * jnp.pi - theta, theta)
        phi = jnp.where(flip2, phi + jnp.pi, phi)
        phi = jnp.mod(phi + jnp.pi, 2 * jnp.pi) - jnp.pi
        state_new = jnp.stack([theta, phi])
        return (state_new, P_new), state_new

    state0 = jnp.asarray(initial_state, jnp.float32)
    P0 = cfg.sigmaK2 * jnp.eye(2)
    (_, _), track = jax.lax.scan(step, (state0, P0), X)
    return track


def make_tracker_tables(max_order: int, ka, theta_s, phi_s):
    """Precompute (Y_matrix [dim, C], bn4pi [F, order]) for `spherical_track`."""
    Y = spherical_harmonics_matrix(max_order, theta_s, phi_s)
    b = mode_amplitudes(max_order, ka)
    i_pow = np.array([(1j) ** (n % 4) for n in range(max_order)])
    bn4pi = 4 * np.pi * i_pow[None, :] * b
    return Y.astype(np.complex64), bn4pi.astype(np.complex64)
