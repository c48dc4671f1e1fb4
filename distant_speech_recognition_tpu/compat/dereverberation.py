"""``btk20.dereverberation`` compatibility: WPE features as pull streams.

The reference WPE features are themselves batch algorithms behind a stream
face: ``estimate_filter()`` buffers the whole utterance of subband frames
(``fill_buffer_``, dereverberation.cc:214-225), runs the EM iterations, and
``next()`` then streams the dereverberated frames.  The compat classes keep
that exact two-phase API, computing with the batched kernels
(models/dereverberation.py) over the buffered frames and replaying rows.

Constructor keywords match the reference drivers 1:1
(test_subband_dereverberator.py:59-75 / 123-131).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.dereverberation import wpe, wpe_multichannel
from ..ops.filterbank import hermitian_mirror
from .stream import FeatureStream

__all__ = [
    "SingleChannelWPEDereverberationFeature",
    "SingleChannelWPEDereverberationFeaturePtr",
    "MultiChannelWPEDereverberation",
    "MultiChannelWPEDereverberationPtr",
    "MultiChannelWPEDereverberationFeature",
    "MultiChannelWPEDereverberationFeaturePtr",
]


def _drain(stream) -> np.ndarray:
    return np.stack([np.asarray(f) for f in stream])  # [T, M]


class SingleChannelWPEDereverberationFeature(FeatureStream):
    def __init__(self, samp, lower_num: int = 0, upper_num: int = 64,
                 iterations_num: int = 2, load_db: float = -20.0,
                 band_width: float = 0.0, samplerate: int = 16000,
                 name: str = "SingleChannelWPEDereverberationFeature"):
        super().__init__(samp.size(), name)
        self.samp = samp
        self._lower = int(lower_num)
        self._upper = int(upper_num)
        self._iters = int(iterations_num)
        self._load_db = float(load_db)
        # band_width > 0 limits filtering to the reference's band-limit bins
        # (models.dereverberation.band_limit_mask); others pass through
        self._band_width = float(band_width)
        self._rate = int(samplerate)
        self._out = None
        self._i = 0

    def print_objective_func(self, every_n: int = 0):
        """Reference debug printing toggle (dereverberation.cc:139-141) — a
        no-op here; use jax debugging hooks instead."""

    def estimate_filter(self) -> int:
        frames = _drain(self.samp)  # [T, M]
        M = frames.shape[-1]
        F = M // 2 + 1
        Yh = jnp.asarray(frames[:, :F])
        out = wpe(Yh, self._lower, self._upper, self._iters, self._load_db,
                  self._band_width, float(self._rate))
        self._out = np.asarray(hermitian_mirror(out, M))
        self._i = 0
        return self._out.shape[0]

    def _produce(self) -> np.ndarray:
        if self._out is None:
            self.estimate_filter()
        if self._i >= self._out.shape[0]:
            raise StopIteration
        row = self._out[self._i]
        self._i += 1
        return row

    def _reset(self):
        self._i = 0
        if hasattr(self.samp, "reset"):
            self.samp.reset()


SingleChannelWPEDereverberationFeaturePtr = SingleChannelWPEDereverberationFeature


class MultiChannelWPEDereverberation:
    """Joint-channel WPE estimator (dereverberation.h:90-165): feed per-channel
    analysis banks with ``set_input``, call ``estimate_filter()``, then view
    each channel through `MultiChannelWPEDereverberationFeature`."""

    def __init__(self, subbands_num: int, channels_num: int, lower_num: int = 0,
                 upper_num: int = 32, iterations_num: int = 2,
                 load_db: float = -20.0, band_width: float = 0.0,
                 diagonal_bias: float = 0.0, samplerate: int = 16000):
        self._M = int(subbands_num)
        self._C = int(channels_num)
        self._lower = int(lower_num)
        self._upper = int(upper_num)
        self._iters = int(iterations_num)
        self._load_db = float(load_db)
        self._band_width = float(band_width)
        self._bias = float(diagonal_bias)
        self._rate = int(samplerate)
        self._inputs = []
        self.outputs = None  # [C, T, M]

    def set_input(self, afb) -> None:
        if len(self._inputs) >= self._C:
            raise ValueError("all channels already connected")
        self._inputs.append(afb)

    def print_objective_func(self, every_n: int = 0):
        pass

    def estimate_filter(self) -> int:
        if len(self._inputs) != self._C:
            raise RuntimeError(f"need {self._C} inputs, got {len(self._inputs)}")
        frames = np.stack([_drain(s) for s in self._inputs])  # [C, T, M]
        F = self._M // 2 + 1
        Yh = jnp.asarray(frames[..., :F])
        out = wpe_multichannel(Yh, self._lower, self._upper, self._iters,
                               self._load_db, self._bias,
                               self._band_width, float(self._rate))
        self.outputs = np.asarray(hermitian_mirror(out, self._M))
        return self.outputs.shape[1]

    def reset(self):
        self.outputs = None
        for s in self._inputs:
            s.reset()


MultiChannelWPEDereverberationPtr = MultiChannelWPEDereverberation


class MultiChannelWPEDereverberationFeature(FeatureStream):
    """Per-channel stream view (dereverberation.h:170-185)."""

    def __init__(self, source: MultiChannelWPEDereverberation, channel_no: int,
                 name: str = "MultiChannelWPEDereverberationFeature"):
        super().__init__(source._M, name)
        self._src = source
        self._ch = int(channel_no)
        self._i = 0

    def _produce(self) -> np.ndarray:
        if self._src.outputs is None:  # primary channel triggers compute
            self._src.estimate_filter()
        if self._i >= self._src.outputs.shape[1]:
            raise StopIteration
        row = self._src.outputs[self._ch, self._i]
        self._i += 1
        return row

    def _reset(self):
        self._i = 0


MultiChannelWPEDereverberationFeaturePtr = MultiChannelWPEDereverberationFeature
