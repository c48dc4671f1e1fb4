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
    """Piecewise-linear VTLN; ``set_warp`` sets the ratio as in the
    reference driver.  ``version=1`` is the bin-integral warp
    (feature.cc nextOrg); ``version=2`` (the reference MFCC extractor's
    choice) is the half-bin spread-and-normalize warp (nextFF), which is a
    [0.25, 0.5, 0.25] smoother even at ratio 1."""

    def __init__(self, samp, coeff_num: int, edge: float = 0.8, version: int = 2):
        super().__init__(samp, int(coeff_num), "VTLNFeature")
        self._edge = float(edge)
        self._version = int(version)
        self._ratio = 1.0

    def set_warp(self, ratio: float):
        self._ratio = float(ratio)

    def _map(self, frame):
        if self._version == 2:
            return np.asarray(
                _feat.vtln_ff(_jnp.asarray(frame[None]), self._ratio, self._edge)
            )[0]
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
    def __init__(self, samp, m: float = 1.0, a: float = 1.0,
                 sphinx_flooring: bool = False):
        super().__init__(samp, samp.size(), "LogFeature")
        self._m, self._a = float(m), float(a)
        self._sphinx = bool(sphinx_flooring)

    def _map(self, frame):
        return np.asarray(
            _feat.log_feature(_jnp.asarray(frame[None]), self._m, self._a, self._sphinx)
        )[0]


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


class BlockSizeConversionFeature(_UnaryFeature):
    """Re-frame a float sample stream to ``block_len`` frames shifted by
    ``shift_len`` (BlockSizeConversionFeature, feature.cc:901-999): frame f
    is the contiguous sample window ``[f*shift, f*shift + block)`` of the
    concatenated source stream; EOF propagates when the window cannot be
    filled (no padding)."""

    def __init__(self, samp, block_len: int = 320, shift_len: int = 160,
                 name: str = "BlockSizeConversionFeature"):
        super().__init__(samp, block_len, name)
        self._block = int(block_len)
        self._shift = int(shift_len)
        self._buf = np.zeros(0, np.float32)
        self._pos = 0
        self._src_done = False

    def _produce(self) -> np.ndarray:
        while not self._src_done and self._pos + self._block > len(self._buf):
            try:
                blk = np.asarray(self.samp.next(), np.float32).ravel()
                self._buf = np.concatenate([self._buf, blk])
                self._buf = self._buf[:]
            except StopIteration:
                self._src_done = True
        if self._pos + self._block > len(self._buf):
            raise StopIteration
        out = self._buf[self._pos : self._pos + self._block].copy()
        self._pos += self._shift
        return out

    def _reset(self):
        super()._reset()
        self._buf = np.zeros(0, np.float32)
        self._pos = 0
        self._src_done = False


BlockSizeConversionFeaturePtr = BlockSizeConversionFeature


class MeanSubtractionFeature(_UnaryFeature):
    """Cepstral mean (and variance) normalization (MeanSubtractionFeature,
    feature.cc:2450-2663).  Batch mode drains the source, computes the
    (weight-gated) mean/variance, and replays normalized frames; runon mode
    updates a running mean per frame with the reference's 0.98/0.995
    schedule (frames < 500 / after)."""

    _variance_floor = 1.0e-4
    _before_wgt = 0.98
    _after_wgt = 0.995
    _frames_to_change = 500

    def __init__(self, samp, weight=None, dev_norm_factor: float = 0.0,
                 runon: bool = False, name: str = "MeanSubtractionFeature"):
        super().__init__(samp, samp.size(), name)
        self._wgt = weight
        self._dev = float(dev_norm_factor)
        self._runon = bool(runon)
        self._mean = np.zeros(samp.size(), np.float32)
        self._var = np.zeros(samp.size(), np.float32)
        self._frames_seen = 0
        self._rows = None
        self._i = 0

    def mean(self) -> np.ndarray:
        return self._mean

    def next_speaker(self):
        """Reset the normalization statistics (feature.cc nextSpeaker)."""
        self._mean[:] = 0.0
        self._var[:] = 0.0
        self._frames_seen = 0
        self._rows = None

    nextSpeaker = next_speaker

    def _normalize(self, v: np.ndarray) -> np.ndarray:
        out = v - self._mean
        if self._dev > 0.0:
            var = np.maximum(self._var, self._variance_floor)
            out = out / (self._dev * np.sqrt(var))
        return out.astype(np.float32)

    def _produce(self) -> np.ndarray:
        if self._runon:
            v = np.asarray(self.samp.next(), np.float32)
            w = 1.0
            if self._wgt is not None:
                w = float(np.asarray(self._wgt.next()).ravel()[0])
            if w > 0.0:
                a = (self._before_wgt if self._frames_seen < self._frames_to_change
                     else self._after_wgt)
                self._mean = a * self._mean + (1.0 - a) * v
                if self._dev > 0.0:
                    d = v - self._mean
                    self._var = a * self._var + (1.0 - a) * d * d
                self._frames_seen += 1
            return self._normalize(v)
        if self._rows is None:
            rows, wgts = [], []
            for v in self.samp:
                rows.append(np.asarray(v, np.float32))
                if self._wgt is not None:
                    wgts.append(float(np.asarray(self._wgt.next()).ravel()[0]))
                else:
                    wgts.append(1.0)
            if not rows:
                raise StopIteration
            S = np.stack(rows)
            w = np.asarray(wgts, np.float32)[:, None]
            ttl = w.sum()
            self._mean = (S * w).sum(axis=0) / ttl
            self._var = (S * S * w).sum(axis=0) / ttl - self._mean**2
            self._rows = self._normalize(S)
            self._i = 0
        if self._i >= len(self._rows):
            raise StopIteration
        row = self._rows[self._i]
        self._i += 1
        return row

    def _reset(self):
        super()._reset()
        if self._wgt is not None and hasattr(self._wgt, "reset"):
            self._wgt.reset()
        self._rows = None
        self._i = 0


MeanSubtractionFeaturePtr = MeanSubtractionFeature


class FileMeanSubtractionFeature(_UnaryFeature):
    """Normalization against a stored mean/variance (feature.cc:2671-2760)."""

    _variance_floor = 1.0e-4

    def __init__(self, samp, dev_norm_factor: float = 0.0,
                 name: str = "FileMeanSubtractionFeature"):
        super().__init__(samp, samp.size(), name)
        self._dev = float(dev_norm_factor)
        self._mean = np.zeros(samp.size(), np.float32)
        self._var = np.ones(samp.size(), np.float32)

    def set_mean(self, mean, variance=None):
        self._mean = np.asarray(mean, np.float32)
        if variance is not None:
            self._var = np.asarray(variance, np.float32)

    def _produce(self) -> np.ndarray:
        v = np.asarray(self.samp.next(), np.float32)
        out = v - self._mean
        if self._dev > 0.0:
            out = out / (self._dev * np.sqrt(np.maximum(self._var, self._variance_floor)))
        return out.astype(np.float32)


FileMeanSubtractionFeaturePtr = FileMeanSubtractionFeature


class AdjacentFeature(_UnaryFeature):
    """Frame splicing with edge replication (AdjacentFeature,
    feature.cc buffer_next_frame_): output frame t is the concatenation of
    source frames ``clip(t-delta .. t+delta, 0, T-1)`` — the start/end
    frames are replicated into the missing context.  Matches
    models/features.adjacent_splice."""

    def __init__(self, samp, delta: int = 5, name: str = "AdjacentFeature"):
        super().__init__(samp, (2 * int(delta) + 1) * samp.size(), name)
        self._delta = int(delta)
        self._rows = None
        self._i = 0

    def _produce(self) -> np.ndarray:
        if self._rows is None:
            S = np.stack([np.asarray(v, np.float32) for v in self.samp])
            T = S.shape[0]
            d = self._delta
            idx = np.clip(np.arange(T)[:, None] + np.arange(-d, d + 1), 0, T - 1)
            self._rows = S[idx].reshape(T, -1)
            self._i = 0
        if self._i >= len(self._rows):
            raise StopIteration
        row = self._rows[self._i]
        self._i += 1
        return row

    def _reset(self):
        super()._reset()
        self._rows = None
        self._i = 0


AdjacentFeaturePtr = AdjacentFeature


class LinearTransformFeature(_UnaryFeature):
    """``y = T x`` per frame (LinearTransformFeature, feature.cc:1159-1190);
    the matrix starts zero like the reference and is set via
    :meth:`set_matrix` / :meth:`identity`."""

    def __init__(self, samp, sz: int = 0, name: str = "LinearTransformFeature"):
        sz = int(sz) or samp.size()
        super().__init__(samp, sz, name)
        self._T = np.zeros((sz, samp.size()), np.float32)

    def matrix(self) -> np.ndarray:
        return self._T

    def set_matrix(self, T) -> None:
        T = np.asarray(T, np.float32)
        if T.shape != self._T.shape:
            raise ValueError(f"expected {self._T.shape}, got {T.shape}")
        self._T = T

    def identity(self) -> None:
        n = min(self._T.shape)
        self._T[:] = 0.0
        self._T[:n, :n] = np.eye(n, dtype=np.float32)

    def _produce(self) -> np.ndarray:
        v = np.asarray(self.samp.next(), np.float32)
        return self._T @ v


LinearTransformFeaturePtr = LinearTransformFeature


class MergeFeature(FeatureStream):
    """Per-frame concatenation of static/delta/delta-delta streams
    (MergeFeature, feature.cc)."""

    def __init__(self, stat, delta, delta_delta, name: str = "MergeFeature"):
        self._srcs = [stat, delta, delta_delta]
        super().__init__(sum(s.size() for s in self._srcs), name)

    def _produce(self) -> np.ndarray:
        return np.concatenate([np.asarray(s.next(), np.float32) for s in self._srcs])

    def _reset(self):
        for s in self._srcs:
            if hasattr(s, "reset"):
                s.reset()


MergeFeaturePtr = MergeFeature


class MultiModalFeature(FeatureStream):
    """Concatenation of modalities with per-modality sample periods
    (MultiModalFeature, feature.cc): a slower modality's slice is refreshed
    only every ``period/min_period`` frames and held in between."""

    def __init__(self, num_modalities: int, total_vec_size: int,
                 name: str = "MultiModalFeature"):
        super().__init__(int(total_vec_size), name)
        self._n = int(num_modalities)
        self._srcs = []
        self._periods = []
        self._held = np.zeros(int(total_vec_size), np.float32)

    def add_modal_feature(self, feature, sample_period_ns: int = 1) -> None:
        if len(self._srcs) == self._n:
            raise RuntimeError("modality capacity exceeded")
        self._srcs.append(feature)
        self._periods.append(int(sample_period_ns))

    addModalFeature = add_modal_feature

    def _produce(self) -> np.ndarray:
        if len(self._srcs) != self._n:
            raise RuntimeError(f"need {self._n} modalities, got {len(self._srcs)}")
        t = self._frame_no + 1
        minp = min(self._periods)
        dim = 0
        for s, p in zip(self._srcs, self._periods):
            if t % (p // minp) == 0 or t == 0:
                self._held[dim : dim + s.size()] = np.asarray(s.next(), np.float32)
            dim += s.size()
        return self._held.copy()

    def _reset(self):
        for s in self._srcs:
            if hasattr(s, "reset"):
                s.reset()
        self._held[:] = 0.0


MultiModalFeaturePtr = MultiModalFeature


class CircularStorageFeature(_UnaryFeature):
    """Pass-through keeping the last ``frames_num`` frames addressable
    (CircularStorageFeature, feature.cc:1260-1290): ``next(f)`` for an
    already-produced recent frame returns it from the ring."""

    def __init__(self, samp, frames_num: int = 3, name: str = "CircularStorageFeature"):
        super().__init__(samp, samp.size(), name)
        self._n = int(frames_num)
        self._ring = {}

    def _map(self, frame: np.ndarray) -> np.ndarray:
        return frame

    def next(self, frame_no: int = -5):
        if frame_no >= 0 and frame_no <= self._frame_no:
            if frame_no in self._ring:
                return self._ring[frame_no]
            raise IndexError(f"frame {frame_no} no longer buffered")
        out = super().next(frame_no)
        self._ring[self._frame_no] = out
        for k in sorted(self._ring):
            if k <= self._frame_no - self._n:
                del self._ring[k]
        return out

    def _reset(self):
        super()._reset()
        self._ring = {}


CircularStorageFeaturePtr = CircularStorageFeature


class StaticStorageFeature(FeatureStream):
    """Source-less storage stream fed programmatically (StaticStorageFeature,
    feature.h:1226-1256): fill with :meth:`set_frames` (or `read`), then
    iterate."""

    def __init__(self, dim: int, name: str = "StaticStorageFeature"):
        super().__init__(int(dim), name)
        self._rows = np.zeros((0, int(dim)), np.float32)
        self._i = 0

    def set_frames(self, rows) -> None:
        rows = np.asarray(rows, np.float32)
        if rows.ndim != 2 or rows.shape[1] != self.size():
            raise ValueError(f"expected [T, {self.size()}]")
        self._rows = rows
        self._i = 0

    def evaluate(self) -> int:
        return self._rows.shape[0]

    def current_n_frames(self) -> int:
        return self._frame_no

    currentNFrames = current_n_frames

    def _produce(self) -> np.ndarray:
        if self._i >= len(self._rows):
            raise StopIteration
        row = self._rows[self._i]
        self._i += 1
        return row

    def _reset(self):
        self._i = 0


StaticStorageFeaturePtr = StaticStorageFeature
