"""``btk20.objective_measure`` compatibility: SNR / segmental SNR /
Itakura-Saito quality classes.

Thin file-reading wrappers (objective_measure/objective_measure.h:36-75)
over the batched implementations in utils/measures.py; the
normalizationOption bit flags (MEAN | MAXPEAK | STDV | CC) are those of
calcSNR (objective_measure.cc:24-27).
"""

from __future__ import annotations

import numpy as np

from ..utils import measures
from ..utils.measures import (  # noqa: F401  (re-exported flags)
    CC_SCALING,
    MAXPEAK_SCALING,
    MEAN_NORMALIZATION,
    STDV_SCALING,
)
from ..utils.wavio import read_wav

__all__ = [
    "SNR",
    "SNRPtr",
    "segmentalSNR",
    "ItakuraSaitoMeasurePS",
    "ItakuraSaitoMeasurePSPtr",
    "MEAN_NORMALIZATION",
    "MAXPEAK_SCALING",
    "STDV_SCALING",
    "CC_SCALING",
]


def _read_channel(fn: str, chX: int = 1, cfrom: int = -1, to: int = -1) -> np.ndarray:
    x, _ = read_wav(fn)
    x = np.atleast_2d(x)[chX - 1]
    if cfrom >= 0:
        x = x[cfrom:]
    if to >= 0:
        x = x[: to - max(cfrom, 0)]
    return x


class SNR:
    """SNR::getSNR / getSNR2 (objective_measure.h:36-46)."""

    def getSNR(self, fn1: str, fn2: str, normalizationOption: int, chX: int = 1,
               samplerate: int = 16000, cfrom: int = -1, to: int = -1) -> float:
        x = _read_channel(fn1, chX, cfrom, to)
        y = _read_channel(fn2, chX, cfrom, to)
        return measures.snr(x, y, normalization_option=normalizationOption)

    def getSNR2(self, original, enhanced, normalizationOption: int) -> float:
        return measures.snr(np.asarray(original), np.asarray(enhanced),
                            normalization_option=normalizationOption)


SNRPtr = SNR


class segmentalSNR:
    """Frame-averaged SNR (objective_measure.h:47-49 declares the class
    empty; the standard clamped segmental SNR is provided here)."""

    def getSegmentalSNR(self, fn1: str, fn2: str, chX: int = 1,
                        frameLen: int = 256) -> float:
        x = _read_channel(fn1, chX)
        y = _read_channel(fn2, chX)
        return measures.segmental_snr(x, y, frame_len=frameLen)

    def getSegmentalSNR2(self, original, enhanced, frameLen: int = 256) -> float:
        return measures.segmental_snr(np.asarray(original), np.asarray(enhanced),
                                      frame_len=frameLen)


class ItakuraSaitoMeasurePS:
    """Discrete Itakura-Saito distance over STFT power spectra
    (ItakuraSaitoMeasurePS, objective_measure.h:51-72)."""

    def __init__(self, fftLen: int, r: int = 1, windowType: int = 1,
                 nm: str = "ItakuraSaitoMeasurePS"):
        self._fftLen = int(fftLen)
        self._r = int(r)
        self._windowType = int(windowType)
        self._D = self._fftLen // (2 ** self._r)

    def frameShiftLength(self) -> int:
        return self._D

    def getDistance(self, fn1: str, fn2: str, chX: int = 1,
                    samplerate: int = 16000, bframe: int = 0,
                    eframe: int = -1) -> float:
        from ..ops.filterbank import stft_analysis

        x = _read_channel(fn1, chX)
        y = _read_channel(fn2, chX)
        s1 = np.asarray(stft_analysis(x, self._fftLen, self._r, self._windowType))
        s2 = np.asarray(stft_analysis(y, self._fftLen, self._r, self._windowType))
        return measures.itakura_saito_frames(s1, s2, bframe=bframe, eframe=eframe)


ItakuraSaitoMeasurePSPtr = ItakuraSaitoMeasurePS
