"""``lib/pykalman.py`` compatibility: KF / EKF / IEKF tracking streams.

Mirrors the reference's tracker protocol (pykalman.py:22-266): pull an
observation list from a TDOA front end, predict, chi-gate the innovation
(the reference's idiosyncratic ``scipy.stats.chi.cdf(d2, df)`` on the
*squared* Mahalanobis distance — reproduced via models/tracking._chi_cdf),
update, and clamp spherical coordinates back into range.  The batched
equivalents (whole-utterance scans) live in models/tracking.py; these
classes serve the reference's frame-at-a-time driver loops
(test_source_tracking.py:102-131).
"""

from __future__ import annotations

import numpy as np

from ..models.tracking import _chi_cdf

__all__ = ["KalmanFilter", "ExtendedKalmanFilter", "IteratedExtendedKalmanFilter"]


def _adjust_spherical(x: np.ndarray) -> np.ndarray:
    """Fold (theta, phi) back into range (pykalman.py adjust_boundaries)."""
    x = np.array(x, np.float64)
    theta = x[0]
    phi = x[1] if len(x) > 1 else 0.0
    if theta < 0.0:
        theta, phi = -theta, phi + np.pi
    elif theta > np.pi:
        theta, phi = theta - np.pi, phi + np.pi
    phi = (phi + np.pi) % (2.0 * np.pi) - np.pi
    x[0] = theta
    if len(x) > 1:
        x[1] = phi
    return x


class KalmanFilter:
    """Linear KF over a source yielding observation vectors (pykalman.py:22-186)."""

    def __init__(self, source, F, U, sigmaV2, sigmaK2, time_delta,
                 initialXk=None, H=None, gate_prob: float = 0.0, boundaries=None):
        self.source = source
        self.F = np.array(F, np.float64)
        self.U = np.array(U, np.float64)
        self.H = None if H is None else np.array(H, np.float64)
        self.sigmaV2 = float(sigmaV2)
        n = self.F.shape[0]
        self.I = np.eye(n)
        self.time_delta = float(time_delta)
        self.gate_prob = float(gate_prob)
        self.boundaries = None if boundaries is None else np.asarray(boundaries, np.float64)
        self.observed = False
        self.K_filter = float(sigmaK2) * np.eye(n)
        self.K_predict = self.K_filter.copy()
        self.lastUpdateT = -1
        self.time = -1
        self.xk_filter = (
            np.zeros(n) if initialXk is None else np.array(initialXk, np.float64)
        )
        self.xk_predict = self.xk_filter.copy()

    # -- reference API ------------------------------------------------------
    def is_observed(self) -> bool:
        return self.observed

    def set_time(self, frame_no: int):
        self.time = frame_no

    def within_room(self, x) -> bool:
        if self.boundaries is None or self.boundaries.ndim == 0:
            return True
        x = np.asarray(x)
        return bool(
            np.all(x >= self.boundaries[: len(x), 0])
            and np.all(x <= self.boundaries[: len(x), 1])
        )

    # -- internals -----------------------------------------------------------
    def predict(self):
        self.xk_predict = self.F @ self.xk_filter

    def _innovation(self, yk):
        S = self.H @ self.K_predict @ self.H.T + self.sigmaV2 * np.eye(len(yk))
        Sinv = np.linalg.inv(S)
        s = np.asarray(yk) - self.H @ self.xk_predict
        return s, Sinv

    def _gated(self, s, Sinv) -> bool:
        if self.gate_prob == 0.0:
            return False
        d2 = float(s @ (Sinv @ s))
        return float(_chi_cdf(d2, len(s))) > self.gate_prob

    def _adjust(self, x):
        return _adjust_spherical(x)

    def update(self, yk, elapsed_time) -> bool:
        self.K_predict = (
            self.F @ self.K_filter @ self.F.T + elapsed_time**2 * self.U
        )
        s, Sinv = self._innovation(yk)
        if self._gated(s, Sinv):
            return False
        G = self.K_predict @ self.H.T @ Sinv
        self.xk_filter = self._adjust(self.xk_predict + G @ s)
        self.K_filter = (self.I - G @ self.H) @ self.K_predict
        self.lastUpdateT = self.time
        return True

    def _observe(self, frame_no):
        """(linearized observation or None).  Linear KF: the raw vector."""
        return self.source.next(frame_no)

    def next(self, frame_no: int) -> np.ndarray:
        self.predict()
        yk = self._observe(frame_no)
        if yk is not None:
            elapsed = (self.time - self.lastUpdateT) * self.time_delta
            self.update(yk, elapsed)
            self.observed = True
        else:
            self.observed = False
        self.time += 1
        return self.xk_filter

    def __iter__(self):
        while True:
            try:
                yield self.next(self.time)
            except StopIteration:
                return


class ExtendedKalmanFilter(KalmanFilter):
    """EKF: relinearize the TDOA observation each frame (pykalman.py:188-217)."""

    def __init__(self, source, F, U, sigmaV2, sigmaK2, time_delta,
                 initialXk=None, gate_prob: float = 0.0, boundaries=None):
        super().__init__(source, F, U, sigmaV2, sigmaK2, time_delta,
                         initialXk=initialXk, gate_prob=gate_prob,
                         boundaries=boundaries)

    def _observe(self, frame_no):
        obs = self.source.next(frame_no)
        if obs is None:
            return None
        self.H = self.source.linearize(self.xk_predict, obs)
        return self.source.calc_linearized_observation(self.xk_predict, self.H, obs)


class IteratedExtendedKalmanFilter(ExtendedKalmanFilter):
    """IEKF: local Gauss-Newton iterations inside the update
    (pykalman.py:219-266)."""

    def __init__(self, source, F, U, sigmaV2, sigmaK2, time_delta,
                 initialXk=None, gate_prob: float = 0.0, boundaries=None,
                 num_iterations: int = 3, iteration_threshold: float = 1e-4):
        super().__init__(source, F, U, sigmaV2, sigmaK2, time_delta,
                         initialXk=initialXk, gate_prob=gate_prob,
                         boundaries=boundaries)
        self.num_iterations = int(num_iterations)
        self.iteration_threshold = float(iteration_threshold)

    def update(self, yk, elapsed_time) -> bool:
        self.K_predict = (
            self.F @ self.K_filter @ self.F.T + elapsed_time**2 * self.U
        )
        eta = self.xk_predict.copy()
        G = None
        for i in range(self.num_iterations):
            s, Sinv = self._innovation(yk)
            if self._gated(s, Sinv):
                return False
            G = self.K_predict @ self.H.T @ Sinv
            zeta = s if i == 0 else s - self.H @ (self.xk_predict - eta)
            eta_prev = eta
            eta = self.xk_predict + G @ zeta
            diff = eta - eta_prev
            if float(diff @ diff) < self.iteration_threshold:
                break
        self.xk_filter = self._adjust(eta)
        self.K_filter = (self.I - G @ self.H) @ self.K_predict
        self.lastUpdateT = self.time
        return True
