"""``lib/pytdoa.py`` compatibility: pairwise GCC-PHAT TDOA front ends.

Pull-model classes mirroring the reference's TDOA feature stack
(PHATFeature -> TDOAFeature -> MicrophonePairSource -> TDOAFeatureVector,
pytdoa.py:11-632) on top of the batched kernels in models/localization.py.
The numeric core (PHAT weighting, peak picking, pair TDOA model and its
Jacobian) is the same code the batch tools use; these classes add the
reference's per-frame gating/observation-list protocol and the far-field
closed-form position estimates.

All delays are seconds, positions are mm, sound speed defaults to the
reference's 343000 mm/s (pytdoa.py make_tdoa_front_end signature).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..models import localization as loc

__all__ = [
    "PHATFeature",
    "TDOAFeature",
    "MicrophonePairSource",
    "MicrophonePairObservation",
    "TDOAFeatureVector",
    "FarfieldLinearArrayTDOAFeatureVector",
    "FarfieldCircularArrayTDOAFeatureVector",
    "make_tdoa_front_end",
]


class PHATFeature:
    """PHAT-weighted GCC of one microphone pair (pytdoa.py:11-63).

    Pulls full-spectrum frames from two spectral streams (e.g. compat
    ``FFTFeature``) and returns the time-domain GCC; frames below the energy
    gate return zeros (the reference's silence skip)."""

    def __init__(self, spec1, spec2, fftlen: int, energy_threshold: float = 64.0):
        self._s1, self._s2 = spec1, spec2
        self._fftlen = int(fftlen)
        self._thresh = float(energy_threshold)

    def next(self, frame_no: int) -> np.ndarray:
        F = self._fftlen // 2 + 1
        X1 = np.asarray(self._s1.next(frame_no))[:F]
        X2 = np.asarray(self._s2.next(frame_no))[:F]
        cc = loc.gcc_phat(
            jnp.asarray(X1[None]), jnp.asarray(X2[None]), self._fftlen, self._thresh
        )
        return np.asarray(cc)[0]

    def reset(self):
        for s in (self._s1, self._s2):
            if hasattr(s, "reset"):
                s.reset()


class TDOAFeature:
    """Highest-|CC|-peak delay of one pair -> ``[delay_s, peak_height]``
    (pytdoa.py:66-123)."""

    def __init__(self, phat: PHATFeature, fftlen: int, samplerate: float):
        self._phat = phat
        self._rate = float(samplerate)

    def next(self, frame_no: int):
        cc = self._phat.next(frame_no)
        delay, height = loc.tdoa_peaks(jnp.asarray(cc[None]), self._rate)
        return [float(np.asarray(delay)[0]), float(np.asarray(height)[0])]

    def reset(self):
        self._phat.reset()


@dataclasses.dataclass
class MicrophonePairObservation:
    """One gated pair observation (pytdoa.py:143-160)."""

    pairx: int
    first_micx: int
    second_micx: int
    observation: float


class MicrophonePairSource:
    """Binds a pair's channel indices to its TDOA feature (pytdoa.py:162-185).
    Caches the frame so `next(frame_no)` can be re-asked (the reference's
    drivers call it from both the vector and `instantaneous_position`)."""

    def __init__(self, pairx: int, first_micx: int, second_micx: int, tdoa: TDOAFeature):
        self.pairx = pairx
        self.first_micx = first_micx
        self.second_micx = second_micx
        self._tdoa = tdoa
        self._frame_no = -1
        self._cache = None

    def next(self, frame_no: int):
        if frame_no != self._frame_no:
            self._cache = self._tdoa.next(frame_no)
            self._frame_no = frame_no
        return self._cache

    def reset(self):
        self._frame_no = -1
        self._cache = None
        self._tdoa.reset()


class TDOAFeatureVector:
    """Near-field (Cartesian) TDOA observation vector (pytdoa.py:187-330).

    ``next(frame_no)`` returns the list of gated `MicrophonePairObservation`s
    or ``None`` when fewer than ``minimum_pairs`` clear the CC threshold;
    ``linearize``/``calc_linearized_observation`` provide the EKF pieces
    through the shared pair model (models/localization.pair_tdoa_*)."""

    #: sentinel the drivers test with ``Xk[0] > -1e10``
    INVALID = -1.0e10

    def __init__(self, mic_pair_srcs, mpos, minimum_pairs: int = 2,
                 threshold: float = 0.12, c: float = 343000.0):
        self._mic_pair_srcs = list(mic_pair_srcs)
        self._mpos = np.asarray(mpos, np.float64)
        self._minimum_pairs = int(minimum_pairs)
        self._threshold = float(threshold)
        self._c = float(c)
        self._tdoabuf = {}
        self._isamp = 0

    # -- helpers -----------------------------------------------------------
    def _pairs_of(self, observations):
        return [(o.first_micx, o.second_micx) for o in observations]

    def _gated(self, frame_no):
        """(delays [P], heights [P]) plus the tdoa buffer refresh."""
        delays, heights = [], []
        self._tdoabuf = {}
        for src in self._mic_pair_srcs:
            d, h = src.next(frame_no)
            self._tdoabuf.setdefault(src.first_micx, {})[src.second_micx] = d
            delays.append(d)
            heights.append(h)
        return np.asarray(delays), np.asarray(heights)

    def mic_pair_tdoa(self):
        return self._tdoabuf

    # -- reference API ------------------------------------------------------
    def tdoa(self, mic_pair, x):
        return float(
            np.asarray(
                loc.pair_tdoa_model(
                    jnp.asarray(np.asarray(x, np.float32)),
                    self._mpos,
                    [(mic_pair.first_micx, mic_pair.second_micx)],
                    self._c,
                )
            )[0]
        )

    def linearize(self, xk_predict, observations):
        H = loc.pair_tdoa_jacobian(
            jnp.asarray(np.asarray(xk_predict, np.float32)),
            self._mpos,
            self._pairs_of(observations),
            self._c,
        )
        return np.asarray(H, np.float64)

    def calc_linearized_observation(self, xk_predict, H, observations):
        x = np.asarray(xk_predict, np.float64)
        pred = np.asarray(
            loc.pair_tdoa_model(
                jnp.asarray(x.astype(np.float32)), self._mpos,
                self._pairs_of(observations), self._c,
            ),
            np.float64,
        )
        obs = np.asarray([o.observation for o in observations])
        return obs - (pred - H @ x)

    def next(self, frame_no: int):
        delays, heights = self._gated(frame_no)
        keep = heights > self._threshold
        if int(keep.sum()) < self._minimum_pairs:
            return None
        return [
            MicrophonePairObservation(s.pairx, s.first_micx, s.second_micx, float(d))
            for s, d, k in zip(self._mic_pair_srcs, delays, keep)
            if k
        ]

    def instantaneous_position(self, frame_no: int) -> np.ndarray:
        """LS position via Gauss-Newton on the pair TDOA model.

        The reference leaves this abstract for the near-field case
        (pytdoa.py:289-294); provided here so 'nf' front ends work with the
        same driver loop."""
        delays, heights = self._gated(frame_no)
        keep = heights > self._threshold
        if int(keep.sum()) < self._minimum_pairs:
            return np.full(3, self.INVALID)
        pairs = [
            (s.first_micx, s.second_micx)
            for s, k in zip(self._mic_pair_srcs, keep)
            if k
        ]
        obs = delays[keep]
        x = self._mpos.mean(axis=0)[:3] + np.array([0.0, 0.0, 1000.0])
        for _ in range(8):
            pred = np.asarray(
                loc.pair_tdoa_model(jnp.asarray(x.astype(np.float32)), self._mpos, pairs, self._c),
                np.float64,
            )
            J = np.asarray(
                loc.pair_tdoa_jacobian(jnp.asarray(x.astype(np.float32)), self._mpos, pairs, self._c),
                np.float64,
            )
            step, *_ = np.linalg.lstsq(J, obs - pred, rcond=None)
            x = x + step
            if float(step @ step) < 1e-6:
                break
        return x

    def __iter__(self):
        while True:
            yield self.next(self._isamp)
            self._isamp += 1

    def reset(self):
        self._isamp = 0
        for src in self._mic_pair_srcs:
            src.reset()


class FarfieldLinearArrayTDOAFeatureVector(TDOAFeatureVector):
    """Far-field linear array: state = azimuth (pytdoa.py:332-441).
    Microphone positions collapse to scalar distances along the array axis."""

    def __init__(self, mic_pair_srcs, mpos, minimum_pairs: int = 2,
                 threshold: float = 0.12, c: float = 343000.0):
        super().__init__(mic_pair_srcs, mpos, minimum_pairs, threshold, c)
        mpos = np.atleast_2d(np.asarray(mpos, np.float64))
        self._dist = np.linalg.norm(mpos - mpos[0], axis=-1)  # [C] mm along axis

    def _pair_dist(self, first, second):
        return self._dist[second] - self._dist[first]

    def tdoa(self, mic_pair, azimuth):
        d = self._pair_dist(mic_pair.first_micx, mic_pair.second_micx)
        return np.array([d * np.cos(float(np.asarray(azimuth).ravel()[0])) / self._c])

    def linearize(self, azimuth_predict, observations):
        az = float(np.asarray(azimuth_predict).ravel()[0])
        d = np.asarray(
            [self._pair_dist(o.first_micx, o.second_micx) for o in observations]
        )
        return (-d * np.sin(az) / self._c)[:, None]

    def calc_linearized_observation(self, azimuth_predict, H, observations):
        az = np.atleast_1d(np.asarray(azimuth_predict, np.float64))
        obs = np.asarray([o.observation for o in observations])
        pred = np.asarray([self.tdoa(o, az)[0] for o in observations])
        return obs - (pred - H @ az)

    def instantaneous_position(self, frame_no: int) -> np.ndarray:
        delays, heights = self._gated(frame_no)
        keep = heights > self._threshold
        if int(keep.sum()) < self._minimum_pairs:
            return np.array([self.INVALID])
        d = np.asarray(
            [self._pair_dist(s.first_micx, s.second_micx) for s in self._mic_pair_srcs]
        )
        cosang = np.clip(delays * self._c / d, -1.0, 1.0)
        return np.array([np.arccos(cosang[keep]).mean()])


class FarfieldCircularArrayTDOAFeatureVector(TDOAFeatureVector):
    """Far-field circular/volumetric array: state = (polar angle, azimuth)
    (pytdoa.py:443-581)."""

    def __init__(self, mic_pair_srcs, mpos, minimum_pairs: int = 2,
                 threshold: float = 0.12, c: float = 343000.0):
        mpos = np.asarray(mpos, np.float64)
        if len(mpos) == 2:
            raise ValueError("2 microphones: use FarfieldLinearArrayTDOAFeatureVector")
        if mpos.shape[-1] < 2:
            raise ValueError("circular array needs >= 2-dim positions")
        super().__init__(mic_pair_srcs, mpos, minimum_pairs, threshold, c)
        if self._mpos.shape[-1] == 2:  # pad z = 0
            self._mpos = np.c_[self._mpos, np.zeros(len(self._mpos))]

    @staticmethod
    def _unit(polar):
        th, ph = float(polar[0]), float(polar[1])
        return np.array(
            [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)]
        )

    def tdoa(self, mic_pair, polarX):
        off = self._mpos[mic_pair.second_micx] - self._mpos[mic_pair.first_micx]
        return np.array([self._unit(polarX) @ off / self._c])

    def linearize(self, polarX, observations):
        th, ph = float(polarX[0]), float(polarX[1])
        du_dth = np.array([np.cos(th) * np.cos(ph), np.cos(th) * np.sin(ph), -np.sin(th)])
        du_dph = np.array([-np.sin(th) * np.sin(ph), np.sin(th) * np.cos(ph), 0.0])
        offs = np.asarray(
            [self._mpos[o.second_micx] - self._mpos[o.first_micx] for o in observations]
        )
        return np.stack([offs @ du_dth, offs @ du_dph], axis=1) / self._c

    def calc_linearized_observation(self, polarX, H, observations):
        x = np.asarray(polarX, np.float64)
        obs = np.asarray([o.observation for o in observations])
        pred = np.asarray([self.tdoa(o, x)[0] for o in observations])
        return obs - (pred - H @ x)

    def instantaneous_position(self, frame_no: int) -> np.ndarray:
        """LS direction vector from gated pair delays, then angles
        (pytdoa.py:518-581: pinv(P) d, clipped, with the planar-array
        branches for arrays lying in an xy-parallel plane)."""
        delays, heights = self._gated(frame_no)
        keep = heights > self._threshold
        if int(keep.sum()) < self._minimum_pairs:
            return np.array([self.INVALID, self.INVALID])
        offs = np.asarray(
            [
                self._mpos[s.second_micx] - self._mpos[s.first_micx]
                for s, k in zip(self._mic_pair_srcs, keep)
                if k
            ]
        )
        A = np.clip(np.linalg.pinv(offs) @ (delays[keep] * self._c), -1.0, 1.0)
        planar = np.count_nonzero(offs[:, 2]) == 0
        cos_th2 = 1.0 - A[0] ** 2 - A[1] ** 2
        if planar:
            if cos_th2 < 0 or (A[0] ** 2 + A[1] ** 2) == 0:
                return np.array([self.INVALID, self.INVALID])
            theta = np.arccos(np.sqrt(cos_th2))
            phi = np.arccos(np.sqrt(A[0] ** 2 / (A[0] ** 2 + A[1] ** 2)))
        else:
            theta = (
                np.arccos(np.sqrt(cos_th2 + A[2]) / 2.0)
                if cos_th2 + A[2] >= 0
                else np.arccos(A[2])
            )
            # average the azimuth hypotheses with valid cos^2 (the z
            # component contributes two more when informative)
            hypos = []
            if (A[0] ** 2 + A[1] ** 2) != 0:
                hypos.append(A[0] ** 2 / (A[0] ** 2 + A[1] ** 2))
            if A[2] ** 2 != 1.0:
                hypos.append(-(A[0] ** 2) / (A[2] ** 2 - 1.0))
                hypos.append((A[1] ** 2 + A[2] ** 2 - 1.0) / (A[2] ** 2 - 1.0))
            hypos = [h for h in hypos if h >= 0]
            if not hypos:
                return np.array([self.INVALID, self.INVALID])
            phi = np.arccos(np.mean([np.sqrt(h) for h in hypos]))
        return np.array([theta, phi])


def make_tdoa_front_end(array_type, pair_ids, spec_sources, fftlen, samplerate,
                        mpos, energy_threshold, minimum_pairs, threshold,
                        sspeed: float = 343000.0):
    """Build the pairwise GCC-PHAT front end for an array type
    (pytdoa.py:593-632); signature matches the reference drivers
    (test_tdoa_estimator.py:56-65, test_source_tracking.py:67-77)."""
    srcs = []
    for pairx, (a, b) in enumerate(pair_ids):
        if a < 0 or b < 0:
            raise ValueError("mic pair IDs must be >= 0")
        phat = PHATFeature(spec_sources[a], spec_sources[b], fftlen, energy_threshold)
        srcs.append(MicrophonePairSource(pairx, a, b, TDOAFeature(phat, fftlen, samplerate)))
    if array_type == "linear":
        return FarfieldLinearArrayTDOAFeatureVector(srcs, mpos, minimum_pairs, threshold, sspeed)
    if array_type == "circular":
        return FarfieldCircularArrayTDOAFeatureVector(srcs, mpos, minimum_pairs, threshold, sspeed)
    if array_type == "planar":
        raise NotImplementedError("planar arrays are not supported (as in the reference)")
    return TDOAFeatureVector(srcs, mpos, minimum_pairs, threshold, sspeed)
