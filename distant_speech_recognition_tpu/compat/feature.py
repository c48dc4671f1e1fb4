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
