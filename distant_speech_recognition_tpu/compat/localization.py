"""``btk20.localization`` compatibility: the GCC estimator family.

Mirrors localization/localization.{h,cc}: recursive noise spectra
(``NoisePowerSpectrum``/``NoiseCrossSpectrum``, localization.cc:1136-1198)
and the ``GCC`` class tower with the six weighting variants
(``calcCrossSpectrumValue``, localization.cc:1322-1392):

    GCCRaw         G = X1 X2*
    GCCGnnSub      G = X1 X2* - Gn1n2
    GCCPhat        G = X1 X2* / |X1 X2*|
    GCCGnnSubPhat  G = (X1 X2* - Gn1n2) / |X1 X2* - Gn1n2|
    GCCMLRRaw      G = X1 X2* |X1||X2| / (q2 |X1|^2|X2|^2 + q1 (N2|X1|^2 + N1|X2|^2))
    GCCMLRGnnSub   the same weight applied to X1 X2* - Gn1n2

``calculate(..., sad=True)`` updates the (optionally beta-smoothed) cross
spectrum and cross-correlation; ``sad=False`` feeds the noise estimators
instead.  ``findMaximum`` reproduces the delay-ordered peak scan with
second-peak ratio and 3-point parabolic interpolation
(localization.cc:1277-1320, getInterpolation :55-77).

The batched equivalents are models/localization.gcc_weighted /
noise_spectra / find_cc_peak.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "NoisePowerSpectrum",
    "NoiseCrossSpectrum",
    "GCC",
    "GCCRaw",
    "GCCRawPtr",
    "GCCGnnSub",
    "GCCGnnSubPtr",
    "GCCPhat",
    "GCCPhatPtr",
    "GCCGnnSubPhat",
    "GCCGnnSubPhatPtr",
    "GCCMLRRaw",
    "GCCMLRRawPtr",
    "GCCMLRGnnSub",
    "GCCMLRGnnSubPtr",
]


def _half_len_view(x: np.ndarray, state) -> np.ndarray:
    """Truncate a full spectrum to the reference's stored length, bins
    0..fftLen/2 (localization.cc:1151-1161,1186-1196).  A full radix-2
    spectrum has even length; an odd-length input is already half-band
    (fftLen/2+1 bins) and passes through.  Once initialized, match the
    stored state's length."""
    if state is not None:
        return x[: state.shape[0]]
    n = x.shape[0]
    return x[: n // 2 + 1] if (n % 2) == 0 else x


class NoisePowerSpectrum:
    """Recursive per-bin noise power estimate (localization.cc:1136-1163).
    The first ``add`` initializes with ``(1-alpha) |X|^2`` over bins
    0..fftLen/2; repeated calls with the same timestamp are ignored."""

    def __init__(self, alpha: float = 0.95):
        self._alpha = float(alpha)
        self._ps: np.ndarray | None = None
        self._timestamp = 0.0

    def set_alpha(self, alpha: float) -> None:
        self._alpha = float(alpha)

    setAlpha = set_alpha

    def get_alpha(self) -> float:
        return self._alpha

    getAlpha = get_alpha

    def add(self, noise_spectrum, timestamp: float) -> None:
        if self._timestamp == timestamp:
            return
        p = np.abs(_half_len_view(np.asarray(noise_spectrum), self._ps)) ** 2
        a, a1 = self._alpha, 1.0 - self._alpha
        self._ps = a1 * p if self._ps is None else a * self._ps + a1 * p
        self._timestamp = timestamp

    def get(self) -> np.ndarray | None:
        return self._ps


class NoiseCrossSpectrum:
    """Recursive noise cross spectrum X1 X2* (localization.cc:1165-1198)."""

    def __init__(self, alpha: float = 0.95):
        self._alpha = float(alpha)
        self._cs: np.ndarray | None = None

    def set_alpha(self, alpha: float) -> None:
        self._alpha = float(alpha)

    setAlpha = set_alpha

    def get_alpha(self) -> float:
        return self._alpha

    getAlpha = get_alpha

    def add(self, noise_spectrum1, noise_spectrum2) -> None:
        n1 = np.asarray(noise_spectrum1)
        n2 = np.asarray(noise_spectrum2)
        if n1.shape != n2.shape:
            raise ValueError("FFT length of noiseSpectra does not match")
        n1 = _half_len_view(n1, self._cs)
        n2 = _half_len_view(n2, self._cs)
        v = n1 * np.conj(n2)
        a, a1 = self._alpha, 1.0 - self._alpha
        self._cs = a1 * v if self._cs is None else a * self._cs + a1 * v

    def get(self) -> np.ndarray | None:
        return self._cs


class GCC:
    """Generalized cross-correlation base (localization.h:117-216).

    Spectra passed to ``calculate`` are half-band (length fftLen/2+1).
    Subclasses implement `_cross_spectrum_value` (vectorized over bins)."""

    def __init__(self, sampleRate: float = 44100.0, fftLen: int = 2048,
                 nChan: int = 16, pairs: int = 6, alpha: float = 0.95,
                 beta: float = 0.5, q: float = 0.3, interpolate: bool = True,
                 noisereduction: bool = True):
        self._rate = float(sampleRate)
        self._fftLen = int(fftLen)
        self._fftLen2 = self._fftLen // 2
        self._len = self._fftLen2 + 1
        self._nChan = int(nChan)
        self._pairs = int(pairs)
        self._beta = float(beta)
        self._q = float(q)
        # q1 = 1 - q, q2 = 2*q (GCC::GCC, localization.cc:1220-1221)
        self._q1, self._q2 = 1.0 - self._q, 2.0 * self._q
        self._interpolate = bool(interpolate)
        self._noisereduction = bool(noisereduction)
        self._noise_ps = [NoisePowerSpectrum(alpha) for _ in range(self._nChan)]
        self._noise_cs = [NoiseCrossSpectrum(alpha) for _ in range(self._pairs)]
        self._cross_spectrum = np.zeros(self._len, np.complex128)
        self._cross_correlation = np.zeros(self._fftLen)
        self._delay = 0.0
        self._max_corr = -np.inf
        self._ratio = 0.0

    # -- weighting hook -------------------------------------------------------
    def _cross_spectrum_value(self, x1, x2, Gn1n2, N1, N2):
        raise NotImplementedError("Not implemented!!!")

    def _to_half(self, x: np.ndarray) -> np.ndarray:
        """Accept the reference's full-fftLen spectra (it requires
        size == fftLen and then reads bins 0..len-1 only,
        localization.cc:1246-1263) as well as half-band input."""
        if x.shape[0] == self._fftLen:
            return x[: self._len]
        if x.shape[0] == self._len:
            return x
        raise ValueError(
            f"spectra must have fftLen = {self._fftLen} or fftLen/2+1 = "
            f"{self._len} bins, got {x.shape[0]}"
        )

    # -- reference API ----------------------------------------------------------
    def calculate(self, spectralSample1, chan1: int, spectralSample2, chan2: int,
                  pair: int, timestamp: float, sad: bool = False,
                  smooth: bool = True) -> None:
        x1 = self._to_half(np.asarray(spectralSample1, np.complex128))
        x2 = self._to_half(np.asarray(spectralSample2, np.complex128))
        if sad:
            Gn1n2 = self._noise_cs[pair].get()
            N1 = self._noise_ps[chan1].get()
            N2 = self._noise_ps[chan2].get()
            G = self._cross_spectrum_value(x1, x2, Gn1n2, N1, N2)
            if smooth:
                self._cross_spectrum = self._beta * self._cross_spectrum + (1.0 - self._beta) * G
            else:
                self._cross_spectrum = G
            self._cross_correlation = np.fft.irfft(self._cross_spectrum, n=self._fftLen)
        else:
            self._noise_ps[chan1].add(x1, timestamp)
            self._noise_ps[chan2].add(x2, timestamp)
            self._noise_cs[pair].add(x1, x2)

    def findMaximum(self, minDelay: float = -np.inf, maxDelay: float = np.inf) -> np.ndarray:
        """Delay-ordered peak scan + second-peak ratio + parabolic
        interpolation (localization.cc:1277-1320).  Returns
        [delay_seconds, peak_corr, peak_ratio]."""
        N, N2 = self._fftLen, self._fftLen2
        i = np.arange(N)
        # delay-ascending reordering: idx 0..N2-1 negative lags, N2.. positive
        dels = np.where(i < N2, i / self._rate, -((N - i) / self._rate))
        idxs = np.where(i < N2, i + N2, i - N2)
        delay_sorted = np.empty(N)
        corr_sorted = np.empty(N)
        delay_sorted[idxs] = dels
        corr_sorted[idxs] = self._cross_correlation
        ok = (delay_sorted >= minDelay) & (delay_sorted <= maxDelay)
        masked = np.where(ok, corr_sorted, -np.inf)
        pos = int(np.argmax(masked))
        self._max_corr = float(masked[pos])
        second = np.partition(masked, -2)[-2]
        self._ratio = float(self._max_corr / second) if second != 0 else 0.0
        self._delay = float(delay_sorted[pos])
        if self._interpolate:
            self._delay = self._parabolic(delay_sorted, corr_sorted, pos)
        return np.array([self._delay, self._max_corr, self._ratio])

    find_maximum = findMaximum

    @staticmethod
    def _parabolic(x: np.ndarray, y: np.ndarray, pos: int) -> float:
        n = x.shape[0]
        pos = min(max(pos, 1), n - 2)  # edge recursion of getInterpolation
        x0, x1_, x2 = x[pos - 1], x[pos], x[pos + 1]
        y0, y1_, y2 = y[pos - 1], y[pos], y[pos + 1]
        s01 = (y1_ - y0) / (x1_ - x0)
        s12 = (y2 - y1_) / (x2 - x1_)
        denom = s12 - s01
        if denom == 0.0:
            return float(x1_)
        return float(0.5 * ((x0 + x1_) - s01 * (x2 - x0) / denom))

    def getPeakDelay(self) -> float:
        return self._delay

    def getPeakCorr(self) -> float:
        return self._max_corr

    def getRatio(self) -> float:
        return self._ratio

    def getCrossSpectrum(self) -> np.ndarray:
        return self._cross_spectrum

    def getCrossCorrelation(self) -> np.ndarray:
        return self._cross_correlation

    def getNoisePowerSpectrum(self, chan: int):
        return self._noise_ps[chan].get()

    def getNoiseCrossSpectrum(self, pair: int):
        return self._noise_cs[pair].get()

    def setAlpha(self, alpha: float) -> None:
        for n in self._noise_cs:
            n.set_alpha(alpha)
        for n in self._noise_ps:
            n.set_alpha(alpha)

    def getAlpha(self) -> float:
        return self._noise_cs[0].get_alpha()


class GCCRaw(GCC):
    def _cross_spectrum_value(self, x1, x2, Gn1n2, N1, N2):
        return x1 * np.conj(x2)


class GCCGnnSub(GCC):
    def _cross_spectrum_value(self, x1, x2, Gn1n2, N1, N2):
        cross = x1 * np.conj(x2)
        return cross if Gn1n2 is None else cross - Gn1n2


class GCCPhat(GCC):
    def _cross_spectrum_value(self, x1, x2, Gn1n2, N1, N2):
        cross = x1 * np.conj(x2)
        mag = np.abs(cross)
        return np.where(mag == 0.0, 0.0, cross / np.where(mag == 0.0, 1.0, mag))


class GCCGnnSubPhat(GCC):
    def _cross_spectrum_value(self, x1, x2, Gn1n2, N1, N2):
        num = x1 * np.conj(x2)
        if Gn1n2 is not None:
            num = num - Gn1n2
        mag = np.abs(num)
        return num / np.where(mag == 0.0, 1.0, mag)


def _mlr_weight(x1, x2, N1, N2, q1, q2):
    X12 = np.abs(x1) ** 2
    X22 = np.abs(x2) ** 2
    if N1 is not None and N2 is not None:
        den = q2 * X12 * X22 + q1 * (N2 * X12 + N1 * X22)
    else:
        den = q2 * X12 * X22
    return np.sqrt(X12 * X22) / np.where(den == 0.0, np.inf, den)


class GCCMLRRaw(GCC):
    def _cross_spectrum_value(self, x1, x2, Gn1n2, N1, N2):
        return x1 * np.conj(x2) * _mlr_weight(x1, x2, N1, N2, self._q1, self._q2)


class GCCMLRGnnSub(GCC):
    def _cross_spectrum_value(self, x1, x2, Gn1n2, N1, N2):
        cross = x1 * np.conj(x2)
        if Gn1n2 is not None and N1 is not None and N2 is not None:
            return (cross - Gn1n2) * _mlr_weight(x1, x2, N1, N2, self._q1, self._q2)
        return cross * _mlr_weight(x1, x2, None, None, self._q1, self._q2)


GCCRawPtr = GCCRaw
GCCGnnSubPtr = GCCGnnSub
GCCPhatPtr = GCCPhat
GCCGnnSubPhatPtr = GCCGnnSubPhat
GCCMLRRawPtr = GCCMLRRaw
GCCMLRGnnSubPtr = GCCMLRGnnSub
