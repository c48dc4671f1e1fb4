"""``btk20.tde`` compatibility: cross-correlation time-delay estimation.

``CCTDE`` mirrors tde/tde.{h,cc}: per frame, window both channels' sample
blocks (Hanning), FFT, PHAT-normalize the cross spectrum (unit-magnitude
``e^{j(arg X2 - arg X1)}`` per bin, optionally band-limited), inverse FFT,
and hold the ``nHeldMaxCC`` largest cross-correlation peaks.  ``next()``
returns the peak time delays in seconds (positive lags below fftLen/2,
negative above, tde.cc:127-247); ``sample_delays()``/``cc_values()``
expose the integer-lag peaks.
"""

from __future__ import annotations

import numpy as np

from ..ops.windows import get_window
from .stream import FeatureStream

__all__ = ["CCTDE", "CCTDEPtr"]


def _next_pow2_at_least(n: int) -> int:
    f = 1
    while f < n:
        f *= 2
    return f


class CCTDE(FeatureStream):
    def __init__(self, samp1, samp2, fftLen: int = 512, nHeldMaxCC: int = 1,
                 freqLowerLimit: int = -1, freqUpperLimit: int = -1,
                 nm: str = "CCTDE"):
        super().__init__(int(nHeldMaxCC), nm)
        rates = []
        for s in (samp1, samp2):
            for attr in ("getSampleRate", "samplerate"):
                if hasattr(s, attr):
                    rates.append(int(getattr(s, attr)()))
                    break
            else:
                rates.append(16000)
        if rates[0] != rates[1]:
            raise ValueError(
                f"the sampling rates must be the same but {rates[0]} != {rates[1]}"
            )
        self._samplerate = rates[0]
        if samp1.size() != samp2.size():
            raise ValueError("block sizes must be the same")
        # the reference derives the FFT length from the block size
        # (get_fft_len, tde.cc:46-47), ignoring the ctor argument
        self._fftLen = _next_pow2_at_least(samp1.size())
        self._n_held = int(nHeldMaxCC)
        if self._n_held >= self._fftLen:
            raise ValueError("nHeldMaxCC must be < fftLen")
        self._freq_lo = int(freqLowerLimit)
        self._freq_hi = int(freqUpperLimit)
        self._window = np.asarray(get_window(2, self._fftLen))  # Hanning
        self._channels = [samp1, samp2]
        self._sample_delays = np.zeros(self._n_held, np.int64)
        self._cc_values = np.full(self._n_held, -1e10)
        self._verbose = False

    # -- reference API ------------------------------------------------------
    def set_target_frequency_range(self, freqLowerLimit: int, freqUpperLimit: int) -> None:
        self._freq_lo = int(freqLowerLimit)
        self._freq_hi = int(freqUpperLimit)

    def sample_delays(self) -> np.ndarray:
        return self._sample_delays

    def cc_values(self) -> np.ndarray:
        return self._cc_values

    def allsamples(self, fftLen: int = -1) -> np.ndarray:
        """Estimate from the whole signal at once (tde.cc:70-125): one big
        windowed FFT per channel, same peak pick.

        The reference reads each channel's ENTIRE buffer directly
        (``data()``/``samplesN()``, tde.cc:108-109) — not the block
        iterator — so no partial tail block is lost; channels may differ in
        length (each windows ``min(len, fftLen)`` of its own samples)."""
        x = []
        for ch in self._channels:
            if hasattr(ch, "data"):
                x.append(np.asarray(ch.data(), np.float64))
            else:  # non-SampleFeature source: fall back to draining blocks
                blocks = []
                while True:
                    try:
                        blocks.append(np.asarray(ch.next(), np.float64))
                    except StopIteration:
                        break
                x.append(np.concatenate(blocks) if blocks else np.zeros(1))
        N = _next_pow2_at_least(max(len(xi) for xi in x)) if fftLen <= 0 else int(fftLen)
        win = np.asarray(get_window(2, N))
        specs = []
        for xi in x:
            n = min(len(xi), N)
            specs.append(np.fft.fft(win * np.pad(xi[:n], (0, N - n))))
        return self._detect_cc_peaks(specs, N)

    # -- machinery ------------------------------------------------------------
    def _detect_cc_peaks(self, specs, N: int) -> np.ndarray:
        X1, X2 = specs
        phase = np.angle(X2) - np.angle(X1)
        cs = np.cos(phase) + 1j * np.sin(phase)
        # Band limiting.  NOTE: the reference's discard block is dead code —
        # tde.cc:166 forces freq_upper_limit_ positive and tde.cc:168 then
        # requires it <= 0, so btk20 never actually band-limits.  The evident
        # intent is implemented here: active whenever a lower limit >= 0 is
        # set, with the upper limit defaulting to Nyquist (tde.cc:168-188).
        lo = self._freq_lo
        hi = self._freq_hi if self._freq_hi > 0 else self._samplerate // 2
        if lo >= 0:
            s1 = int(lo * N / float(self._samplerate))
            e1 = int(hi * N / float(self._samplerate))
            for i in range(1, s1 + 1):
                cs[i] = 0.0
                cs[N - 1 - i] = 0.0
            for i in range(e1, N // 2):
                cs[i] = 0.0
                cs[N - 1 - i] = 0.0
        cc = np.real(np.fft.ifft(cs))
        # N-best peak pick over all lags (tde.cc:190-247).  sample_delays_
        # holds the RAW cc indices (0..N-1, tde.cc:212); only the returned
        # vector converts to signed seconds (tde.cc:225-233) — verified
        # against the compiled reference (tests/test_cpp_golden_tail.py).
        order = np.argsort(-cc)[: self._n_held]
        self._sample_delays = order.astype(np.int64)
        self._cc_values = cc[order]
        signed = np.where(order < N // 2, order, -(N - order).astype(np.int64))
        return signed.astype(np.float64) / self._samplerate

    def _produce(self) -> np.ndarray:
        specs = []
        for ch in self._channels:
            block = np.asarray(ch.next(self._frame_no + 1), np.float64)
            sect = np.zeros(self._fftLen)
            n = min(block.shape[0], self._fftLen)
            sect[:n] = self._window[:n] * block[:n]
            specs.append(np.fft.fft(sect))
        return self._detect_cc_peaks(specs, self._fftLen)

    def _reset(self):
        for ch in self._channels:
            if hasattr(ch, "reset"):
                ch.reset()

    # legacy aliases
    def setTargetFrequencyRange(self, freqLowerLimit, freqUpperLimit):
        self.set_target_frequency_range(freqLowerLimit, freqUpperLimit)

    def getSampleDelays(self):
        return self.sample_delays()

    def getCCValues(self):
        return self.cc_values()


CCTDEPtr = CCTDE
