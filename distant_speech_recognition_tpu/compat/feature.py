"""``btk20.feature`` compatibility: audio sources as pull streams.

``SampleFeature`` mirrors feature/feature.h:153-209 + feature.cc:241-330:
a WAV reader emitting ``block_len`` float samples per frame, advancing
``shift_len``, with the ``pad_zeros`` end-of-stream protocol (the final
partial block is zero-padded and the stream ends only once every real
sample has been emitted, feature.cc:626-640).  Samples are raw int16-scale
floats (the reference's norm=0.0 convention) unless ``normalize=True``.
"""

from __future__ import annotations

import numpy as np

from ..utils.wavio import read_wav, write_wav
from .stream import FeatureStream

__all__ = ["SampleFeature", "SampleFeaturePtr", "IterativeSingleChannelSampleFeature"]


class SampleFeature(FeatureStream):
    def __init__(self, block_len: int = 320, shift_len: int | None = None,
                 pad_zeros: bool = False, name: str = "SampleFeature"):
        super().__init__(block_len, name)
        self._block = int(block_len)
        self._shift = int(shift_len) if shift_len else self._block
        self._pad = bool(pad_zeros)
        self._x = np.zeros(0, np.float32)
        self._rate = 16000
        self._pos = 0

    # -- loading ----------------------------------------------------------
    def read(self, path: str, samplerate: int = 16000, ch: int = 0,
             normalize: bool = False):
        x, rate = read_wav(path, normalize=normalize)
        self._x = np.asarray(x[ch] if x.ndim == 2 else x, np.float32)
        self._rate = rate if rate else samplerate
        self.reset()

    def set_samples(self, samples, samplerate: int = 16000):
        """Feed samples directly (reference: setSamples via SWIG typemap)."""
        self._x = np.asarray(samples, np.float32).ravel()
        self._rate = int(samplerate)
        self.reset()

    def write(self, path: str, samplerate: int | None = None):
        write_wav(path, self._x, samplerate or self._rate, normalized=False)

    # -- signal utilities (feature/feature.h:167-209) ----------------------
    def data(self) -> np.ndarray:
        return self._x

    def samplerate(self) -> int:
        return self._rate

    def getSampleRate(self) -> int:  # legacy alias (feature.h ENABLE_LEGACY_BTK_API)
        return self._rate

    def cut(self, start: int, end: int):
        self._x = self._x[start:end]
        self.reset()

    def zero_mean(self):
        self._x = self._x - self._x.mean()

    def add_white_noise(self, snr_db: float = 40.0, seed: int = 0):
        rng = np.random.default_rng(seed)
        p = float(np.mean(self._x**2)) or 1.0
        sigma = np.sqrt(p / (10.0 ** (snr_db / 10.0)))
        self._x = (self._x + sigma * rng.standard_normal(len(self._x))).astype(np.float32)

    def randomize(self, start: int, end: int, sigma2: float, seed: int = 0):
        rng = np.random.default_rng(seed)
        self._x[start:end] = (np.sqrt(sigma2) * rng.standard_normal(end - start)).astype(np.float32)

    # -- stream protocol ----------------------------------------------------
    def _produce(self) -> np.ndarray:
        T = len(self._x)
        if self._pad:
            if self._pos >= T:  # every real sample already emitted
                raise StopIteration
        else:
            if self._pos + self._block > T:
                raise StopIteration
        blk = self._x[self._pos : self._pos + self._block]
        if len(blk) < self._block:
            blk = np.concatenate([blk, np.zeros(self._block - len(blk), np.float32)])
        self._pos += self._shift
        return blk

    def _reset(self):
        self._pos = 0


SampleFeaturePtr = SampleFeature


class IterativeSingleChannelSampleFeature(SampleFeature):
    """Chunked reader (feature/feature.h:237-322).  Reads the file in O(1)
    blocks through the native runtime when available; the pull API is
    identical to `SampleFeature`, so here it shares the implementation
    (the chunking is an implementation detail the batch framework's
    `runtime.native_io.NativeStreamReader` already provides)."""


IterativeSingleChannelSampleFeaturePtr = IterativeSingleChannelSampleFeature


# ---------------------------------------------------------------------------
# Feature-chain nodes (feature/feature.h:436-1041) — the MFCC front end as
# pull streams, each a per-frame view of the batched kernels in
# models/features.py (mfcc_extractor.py driver chain).
# ---------------------------------------------------------------------------

import jax.numpy as _jnp

from ..models import features as _feat


class _UnaryFeature(FeatureStream):
    """One-input node: applies a per-frame map to the upstream frame."""

    def __init__(self, samp, size, name):
        super().__init__(size, name)
        self.samp = samp

    def _map(self, frame: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def _produce(self):
        return self._map(np.asarray(self.samp.next(self._frame_no + 1)))

    def _reset(self):
        if hasattr(self.samp, "reset"):
            self.samp.reset()


class StorageFeature(_UnaryFeature):
    """Pass-through that records every frame (feature/feature.h:1196-1264);
    ``frames()`` returns the stacked log, ``write`` pickles it."""

    def __init__(self, samp, name: str = "StorageFeature"):
        super().__init__(samp, samp.size(), name)
        self._log = []

    def _map(self, frame):
        self._log.append(frame)
        return frame

    def frames(self) -> np.ndarray:
        return np.stack(self._log) if self._log else np.zeros((0, self._size))

    def write(self, path: str):
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self.frames(), f)

    def _reset(self):
        super()._reset()
        self._log = []


class PreemphasisFeature(_UnaryFeature):
    """y[i] = x[i] - mu x[i-1], prior sample carried across frames
    (feature.cc:1128-1145)."""

    def __init__(self, samp, mu: float = 0.95):
        super().__init__(samp, samp.size(), "PreemphasisFeature")
        self._mu = float(mu)
        self._prior = 0.0

    def _map(self, frame):
        shifted = np.concatenate([[self._prior], frame[:-1]])
        self._prior = float(frame[-1])
        return (frame - self._mu * shifted).astype(np.float32)

    def _reset(self):
        super()._reset()
        self._prior = 0.0


class HammingFeature(_UnaryFeature):
    def __init__(self, samp):
        super().__init__(samp, samp.size(), "HammingFeature")
        n = samp.size()
        self._w = (0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))).astype(np.float32)

    def _map(self, frame):
        return frame * self._w


class FFTFeature(_UnaryFeature):
    def __init__(self, samp, fft_len: int):
        super().__init__(samp, int(fft_len), "FFTFeature")
        self._n = int(fft_len)

    def _map(self, frame):
        return np.asarray(_feat.fft_feature(_jnp.asarray(frame[None]), self._n))[0]


class SpectralPowerFeature(_UnaryFeature):
    def __init__(self, samp, pow_num: int):
        super().__init__(samp, int(pow_num), "SpectralPowerFeature")
        self._pow_num = int(pow_num)

    def _map(self, frame):
        return np.asarray(_feat.spectral_power(_jnp.asarray(frame[None]), self._pow_num))[0]


class VTLNFeature(_UnaryFeature):
    """Piecewise-linear VTLN (feature.cc nextOrg warp); ``set_warp`` sets the
    ratio as in the reference driver."""

    def __init__(self, samp, coeff_num: int, edge: float = 0.8, version: int = 2):
        super().__init__(samp, int(coeff_num), "VTLNFeature")
        self._edge = float(edge)
        self._ratio = 1.0

    def set_warp(self, ratio: float):
        self._ratio = float(ratio)

    def _map(self, frame):
        if self._ratio == 1.0:
            return frame
        return np.asarray(_feat.vtln(_jnp.asarray(frame[None]), self._ratio, self._edge))[0]


class MelFeature(_UnaryFeature):
    def __init__(self, samp, pow_num: int, filter_num: int = 30, rate: float = 16000.0,
                 low: float = 100.0, up: float = 6800.0, version: int = 2):
        super().__init__(samp, int(filter_num), "MelFeature")
        self._mat = _feat.mel_matrix(int(pow_num), float(rate), float(low),
                                     float(up), int(filter_num)).astype(np.float32)

    def _map(self, frame):
        return self._mat @ frame


class LogFeature(_UnaryFeature):
    def __init__(self, samp, floor: float = 1.0):
        super().__init__(samp, samp.size(), "LogFeature")
        self._floor = float(floor)

    def _map(self, frame):
        return np.asarray(_feat.log_feature(_jnp.asarray(frame[None]), self._floor))[0]


class CepstralFeature(_UnaryFeature):
    def __init__(self, samp, ncep: int = 13, dct_type: int = 1):
        super().__init__(samp, int(ncep), "CepstralFeature")
        self._dct = _feat.dct_matrix(int(ncep), samp.size(), int(dct_type)).astype(np.float32)

    def _map(self, frame):
        return self._dct @ frame


class FeatureSet:
    """Named stream registry (feature/feature.h FeatureSet)."""

    def __init__(self):
        self._d = {}

    def add(self, feature, name: str | None = None):
        self._d[name or feature.name()] = feature

    def feature(self, name: str):
        return self._d[name]

    def names(self):
        return list(self._d)


StorageFeaturePtr = StorageFeature
PreemphasisFeaturePtr = PreemphasisFeature
HammingFeaturePtr = HammingFeature
FFTFeaturePtr = FFTFeature
SpectralPowerFeaturePtr = SpectralPowerFeature
VTLNFeaturePtr = VTLNFeature
MelFeaturePtr = MelFeature
LogFeaturePtr = LogFeature
CepstralFeaturePtr = CepstralFeature
FeatureSetPtr = FeatureSet

__all__ += [
    "StorageFeature", "StorageFeaturePtr",
    "PreemphasisFeature", "PreemphasisFeaturePtr",
    "HammingFeature", "HammingFeaturePtr",
    "FFTFeature", "FFTFeaturePtr",
    "SpectralPowerFeature", "SpectralPowerFeaturePtr",
    "VTLNFeature", "VTLNFeaturePtr",
    "MelFeature", "MelFeaturePtr",
    "LogFeature", "LogFeaturePtr",
    "CepstralFeature", "CepstralFeaturePtr",
    "FeatureSet", "FeatureSetPtr",
]
