"""``btk20.modulated`` compatibility: oversampled DFT filterbanks as streams.

Thin pull-model adapters over the chunked streaming kernels
(models/streaming.streaming_analysis/streaming_synthesis), reproducing the
reference's frame protocol exactly:

- analysis (modulated.cc:375-409): one subband frame per upstream D-block;
  the first ``laN`` pushes are skipped (delay compensation type 2 look-ahead)
  and ``analysis_delay`` zero blocks are substituted after upstream EOF
  (the zero-padding tail of modulated.cc:418-469), so the frame count equals
  ``ops.filterbank.num_analysis_frames``.
- synthesis (modulated.cc:569-612): ``synthesis_delay`` priming frames are
  consumed before the first D-sample block is emitted (modulated.cc:574-578);
  ``input_source_vector()`` direct feeding is supported like the reference.
"""

from __future__ import annotations

from collections import deque

import jax.numpy as jnp
import numpy as np

from ..models.streaming import (
    analysis_init,
    streaming_analysis,
    streaming_synthesis,
    synthesis_init,
)
from ..ops.filterbank import FilterbankParams
from .stream import FeatureStream

__all__ = [
    "OverSampledDFTAnalysisBank",
    "OverSampledDFTAnalysisBankPtr",
    "OverSampledDFTSynthesisBank",
    "OverSampledDFTSynthesisBankPtr",
]


class OverSampledDFTAnalysisBank(FeatureStream):
    def __init__(self, samp, prototype, M: int, m: int, r: int,
                 delay_compensation_type: int = 0, name: str = "OverSampledDFTAnalysisBank"):
        super().__init__(M, name)
        self.samp = samp
        self.p = FilterbankParams(M=M, m=m, r=r,
                                  delay_compensation_type=delay_compensation_type)
        self._h = jnp.asarray(np.asarray(prototype, np.float32).ravel())
        if self._h.shape != (self.p.N,):
            raise ValueError(f"prototype must have N=M*m={self.p.N} taps")
        self._reset()

    def polyphase(self, mi: int, n: int) -> float:
        """Prototype tap ``h[mi + M*n]`` (OverSampledDFTFilterBank::polyphase,
        modulated.cc:232-279)."""
        return float(self._h[mi + self.p.M * n])

    def frame_shift_len(self) -> int:
        return self.p.D

    def _pull_block(self) -> np.ndarray:
        try:
            blk = np.asarray(self.samp.next(self._src_frame + 1), np.float32)
            self._src_frame += 1
        except StopIteration:
            if self._eof_pads_left <= 0:
                raise
            self._eof_pads_left -= 1
            blk = np.zeros(self.p.D, np.float32)
        if blk.shape != (self.p.D,):
            raise ValueError(f"upstream block must be D={self.p.D} samples")
        return blk

    def _produce(self) -> np.ndarray:
        while True:
            blk = self._pull_block()
            self._st, fr = streaming_analysis(self._st, jnp.asarray(blk), self._h, self.p)
            if self._skip_left:
                self._skip_left -= 1
                continue
            return np.asarray(fr[0])

    def _reset(self):
        self._st = analysis_init(self.p)
        self._skip_left = self.p.laN
        self._eof_pads_left = self.p.analysis_delay
        self._src_frame = -1
        if hasattr(self.samp, "reset"):
            self.samp.reset()


OverSampledDFTAnalysisBankPtr = OverSampledDFTAnalysisBank


class OverSampledDFTSynthesisBank(FeatureStream):
    def __init__(self, samp=None, prototype=None, M: int = 256, m: int = 4, r: int = 1,
                 delay_compensation_type: int = 0, gain_factor: float = 1.0,
                 name: str = "OverSampledDFTSynthesisBank"):
        self.p = FilterbankParams(M=M, m=m, r=r,
                                  delay_compensation_type=delay_compensation_type)
        super().__init__(self.p.D, name)
        self.samp = samp
        self._g = jnp.asarray(np.asarray(prototype, np.float32).ravel())
        if self._g.shape != (self.p.N,):
            raise ValueError(f"prototype must have N=M*m={self.p.N} taps")
        self._gain = float(gain_factor)
        self._reset()

    def input_source_vector(self, Y) -> None:
        """Feed one full-M subband frame directly, bypassing the stream graph
        (modulated.h:312-349 `input_source_vector`)."""
        self._feed.append(np.asarray(Y, np.complex64))

    def _pull_frame(self) -> np.ndarray:
        if self.samp is not None:
            Y = np.asarray(self.samp.next(self._src_frame + 1), np.complex64)
            self._src_frame += 1
            return Y
        if not self._feed:
            raise StopIteration
        return self._feed.popleft()

    def _synth_one(self, Y: np.ndarray) -> np.ndarray:
        self._st, y = streaming_synthesis(self._st, jnp.asarray(Y)[None, :], self._g, self.p)
        return np.asarray(y)

    def _produce(self) -> np.ndarray:
        while self._prime_left:
            self._synth_one(self._pull_frame())
            self._prime_left -= 1
        out = self._synth_one(self._pull_frame())
        return out * self._gain if self._gain != 1.0 else out

    def _reset(self):
        self._st = synthesis_init(self.p)
        self._prime_left = self.p.synthesis_delay
        self._feed = deque()
        self._src_frame = -1
        if self.samp is not None and hasattr(self.samp, "reset"):
            self.samp.reset()


OverSampledDFTSynthesisBankPtr = OverSampledDFTSynthesisBank


class _BufferedBank(FeatureStream):
    """Drain-then-replay adapter: pulls the whole upstream, runs the batched
    kernel once, and replays rows.  The batched kernels are frame-causal, so
    outputs equal a frame-by-frame run (unlike the ODFT banks above, these
    banks have no streaming-kernel counterpart yet)."""

    def __init__(self, samp, size, name):
        super().__init__(size, name)
        self.samp = samp
        self._rows = None
        self._i = 0

    def _compute(self, x: np.ndarray) -> np.ndarray:  # -> [T, size]
        raise NotImplementedError

    def _drain_samples(self) -> np.ndarray:
        blocks = [np.asarray(v, np.float32) for v in self.samp]
        if not blocks:
            raise StopIteration
        return np.concatenate(blocks)

    def _produce(self) -> np.ndarray:
        if self._rows is None:
            self._rows = np.asarray(self._compute(self._drain_samples()))
            self._i = 0
        if self._i >= self._rows.shape[0]:
            raise StopIteration
        row = self._rows[self._i]
        self._i += 1
        return row

    def _reset(self):
        self._rows = None
        self._i = 0
        if hasattr(self.samp, "reset"):
            self.samp.reset()


class NormalFFTAnalysisBank(_BufferedBank):
    """Plain windowed STFT stream (NormalFFTAnalysisBank,
    modulated.cc:96-227; window types 0 rect / 1 Hamming / 2 Hann).  Drives
    `ops.filterbank.stft_analysis`; verified against the compiled reference
    (tests/test_cpp_golden.py)."""

    def __init__(self, samp, fftLen: int, r: int = 1, window_type: int = 1,
                 name: str = "NormalFFTAnalysisBank"):
        super().__init__(samp, fftLen, name)
        self._M = int(fftLen)
        self._r = int(r)
        self._wt = int(window_type)

    def fftlen(self) -> int:
        return self._M

    fftLen = fftlen

    def _compute(self, x):
        from ..ops.filterbank import stft_analysis

        return np.asarray(stft_analysis(jnp.asarray(x), self._M, self._r, self._wt))


NormalFFTAnalysisBankPtr = NormalFFTAnalysisBank


class PerfectReconstructionFFTAnalysisBank(_BufferedBank):
    """Cosine-modulated PR filterbank analysis stream
    (PerfectReconstructionFFTAnalysisBank, modulated.cc:634-770) over
    `ops.pr_filterbank.pr_analysis`."""

    def __init__(self, samp, prototype, M: int, m: int, r: int,
                 name: str = "PerfectReconstructionFFTAnalysisBank"):
        from ..ops.pr_filterbank import PRFilterbankParams

        super().__init__(samp, 2 * M, name)
        self.p = PRFilterbankParams(M=M, m=m, r=r)
        self._h = np.asarray(prototype, np.float64).ravel()

    def fftLen(self) -> int:
        return self.p.bands

    def _compute(self, x):
        from ..ops.pr_filterbank import pr_analysis

        return np.asarray(pr_analysis(jnp.asarray(x, jnp.float32),
                                      jnp.asarray(self._h, jnp.float32), self.p))


PerfectReconstructionFFTAnalysisBankPtr = PerfectReconstructionFFTAnalysisBank


class PerfectReconstructionFFTSynthesisBank(FeatureStream):
    """PR synthesis stream (modulated.cc:772-904): buffers upstream subband
    frames, synthesizes once, replays D-sample blocks.  Supports
    ``input_source_vector`` direct feeding like the reference."""

    def __init__(self, samp=None, prototype=None, M: int = 64, m: int = 2,
                 r: int = 0, name: str = "PerfectReconstructionFFTSynthesisBank"):
        from ..ops.pr_filterbank import PRFilterbankParams

        self.p = PRFilterbankParams(M=M, m=m, r=r)
        super().__init__(self.p.D, name)
        self.samp = samp
        self._g = np.asarray(prototype, np.float64).ravel()
        self._feed = []
        self._rows = None
        self._i = 0

    def input_source_vector(self, block) -> None:
        self._feed.append(np.asarray(block, np.complex64))

    inputSourceVector = input_source_vector

    def _produce(self) -> np.ndarray:
        from ..ops.pr_filterbank import pr_synthesis

        if self._rows is None:
            if self.samp is not None:
                frames = [np.asarray(v, np.complex64) for v in self.samp]
            else:
                frames, self._feed = self._feed, []
            if len(frames) <= self.p.processing_delay:
                raise StopIteration
            Y = jnp.asarray(np.stack(frames))
            y = np.asarray(pr_synthesis(Y, jnp.asarray(self._g, jnp.float32), self.p))
            self._rows = y.reshape(-1, self.p.D)
            self._i = 0
        if self._i >= self._rows.shape[0]:
            raise StopIteration
        row = self._rows[self._i]
        self._i += 1
        return row

    def _reset(self):
        self._rows = None
        self._i = 0
        self._feed = []
        if self.samp is not None and hasattr(self.samp, "reset"):
            self.samp.reset()


PerfectReconstructionFFTSynthesisBankPtr = PerfectReconstructionFFTSynthesisBank

__all__ += [
    "NormalFFTAnalysisBank",
    "NormalFFTAnalysisBankPtr",
    "PerfectReconstructionFFTAnalysisBank",
    "PerfectReconstructionFFTAnalysisBankPtr",
    "PerfectReconstructionFFTSynthesisBank",
    "PerfectReconstructionFFTSynthesisBankPtr",
]
