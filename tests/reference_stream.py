"""Frame-by-frame numpy simulator of the reference filterbank streams.

This mirrors, step for step, the ring-buffer state machines of
``OverSampledDFTAnalysisBank`` / ``OverSampledDFTSynthesisBank``
(modulated/modulated.cc:375-612) so the dense batched JAX implementation in
``distant_speech_recognition_tpu.ops.filterbank`` can be tested for exact
behavioral equivalence without building the C++ reference.  Written from the
algorithm description, double precision throughout (as the reference's
internal buffers are double).
"""

from __future__ import annotations

import numpy as np


class RealBuffer:
    """Circular buffer of nsamp length-len vectors (modulated.h:56-140)."""

    def __init__(self, length: int, nsamp: int):
        self.len = length
        self.nsamp = nsamp
        self.samples = np.zeros((nsamp, length))
        self.zero = nsamp - 1

    def sample(self, time_x: int, bin_x: int) -> float:
        return self.samples[(self.zero + self.nsamp - time_x) % self.nsamp, bin_x]

    def row(self, time_x: int) -> np.ndarray:
        return self.samples[(self.zero + self.nsamp - time_x) % self.nsamp]

    def next_sample(self, s=None, reverse: bool = False) -> None:
        self.zero = (self.zero + 1) % self.nsamp
        if s is None:
            self.samples[self.zero] = 0.0
        elif reverse:
            self.samples[self.zero] = np.asarray(s)[::-1]
        else:
            self.samples[self.zero] = s


class BlockSource:
    """SampleFeature with block_len == shift_len == D, pad_zeros=True
    (feature/feature.cc:605-648)."""

    def __init__(self, x: np.ndarray, D: int):
        self.x = np.asarray(x, dtype=np.float64)
        self.D = D
        self.cur = 0

    def next(self):
        if self.cur >= len(self.x):
            raise StopIteration
        block = np.zeros(self.D)
        seg = self.x[self.cur : self.cur + self.D]
        block[: len(seg)] = seg
        self.cur += self.D
        return block


class StreamAnalysis:
    """OverSampledDFTAnalysisBank (modulated.cc:326-469)."""

    def __init__(self, h: np.ndarray, M: int, m: int, r: int, delay_comp: int = 2):
        self.M, self.m, self.r = M, m, r
        self.R = 1 << r
        self.D = M // self.R
        self.h = np.asarray(h, dtype=np.float64)
        assert len(self.h) == M * m
        if delay_comp == 1:
            self.pd, self.laN = m * self.R - 1, 0
        elif delay_comp == 2:
            self.pd, self.laN = m * self.R - 1, m * self.R // 2 - 1
        else:
            self.pd, self.laN = 2 * m - 1, 0
        self.buffer = RealBuffer(M, m * self.R)
        self.gsi = RealBuffer(self.D, self.R)
        self.frames_padded = 0
        self.started = False

    def polyphase(self, mi: int, k: int) -> float:
        return self.h[mi + self.M * k]

    def _update_buf(self):
        convert = np.concatenate(
            [self.gsi.row(self.R - s - 1) for s in range(self.R)]
        )
        self.buffer.next_sample(convert, reverse=True)

    def _push(self, src: BlockSource) -> bool:
        """Returns True at end of stream."""
        if not self.started:
            self.started = True
            for _ in range(self.laN):
                try:
                    block = src.next()
                except StopIteration:
                    return True
                self.gsi.next_sample(block)
                self._update_buf()
        if self.frames_padded == 0:
            try:
                block = src.next()
                self.gsi.next_sample(block)
            except StopIteration:
                self.frames_padded += 1
                self.gsi.next_sample(None)
            self._update_buf()
        elif self.frames_padded < self.pd:
            self.gsi.next_sample(None)
            self._update_buf()
            self.frames_padded += 1
        else:
            return True
        return False

    def run(self, x: np.ndarray) -> np.ndarray:
        """All subband frames for signal x: [n_frames, M] complex128."""
        src = BlockSource(x, self.D)
        out = []
        while True:
            if self._push(src):
                break
            v = np.zeros(self.M)
            for mi in range(self.M):
                v[mi] = sum(
                    self.polyphase(mi, k) * self.buffer.sample(self.R * k, mi)
                    for k in range(self.m)
                )
            # unnormalized backward DFT
            out.append(np.fft.ifft(v) * self.M)
        return np.array(out)


class StreamSynthesis:
    """OverSampledDFTSynthesisBank (modulated.cc:474-612)."""

    def __init__(self, g: np.ndarray, M: int, m: int, r: int, delay_comp: int = 2):
        self.M, self.m, self.r = M, m, r
        self.R = 1 << r
        self.D = M // self.R
        self.g = np.asarray(g, dtype=np.float64)
        assert len(self.g) == M * m
        if delay_comp == 1:
            self.pd = m * self.R - 1
        elif delay_comp == 2:
            self.pd = m * self.R // 2
        else:
            self.pd = 2 * m - 1
        self.buffer = RealBuffer(M, m * self.R)
        self.gsi = RealBuffer(M, self.R)

    def polyphase(self, mi: int, k: int) -> float:
        return self.g[mi + self.M * k]

    def _push(self, Y: np.ndarray) -> None:
        # forward unnormalized DFT, real part (modulated.cc:551-567)
        c = np.real(np.fft.fft(Y))
        self.buffer.next_sample(c)

    def run(self, Y: np.ndarray) -> np.ndarray:
        """Synthesize all output samples from subband frames Y [T, M]."""
        T = Y.shape[0]
        out = []
        fed = 0
        for _ in range(self.pd):  # priming (modulated.cc:574-578)
            self._push(Y[fed]); fed += 1
        while fed < T:
            self._push(Y[fed]); fed += 1
            s = np.zeros(self.M)
            for mi in range(self.M):
                s[mi] = sum(
                    self.polyphase(self.M - mi - 1, k) * self.buffer.sample(self.R * k, mi)
                    for k in range(self.m)
                )
            self.gsi.next_sample(s)
            frame = np.zeros(self.D)
            for sx in range(self.R):
                for d in range(self.D):
                    frame[self.D - d - 1] += self.gsi.sample(self.R - sx - 1, d + sx * self.D)
            out.append(frame)
        return np.concatenate(out)


class StreamPRAnalysis:
    """PerfectReconstructionFFTAnalysisBank (modulated.cc:634-756)."""

    def __init__(self, proto: np.ndarray, M: int, m: int, r: int):
        self.M, self.m, self.r = M, m, r
        self.M2 = 2 * M
        self.R = 1 << r
        self.R2 = 2 * self.R
        self.D = M // self.R
        self.proto = np.asarray(proto, np.float64)
        assert len(self.proto) == self.M2 * m
        self.pd = 2 * m - 1
        self.buffer = RealBuffer(self.M2, m * (r + 2))
        self.gsi = RealBuffer(self.D, self.R2)
        self.w = np.exp(-1j * np.pi * np.arange(self.M2) / self.M2)
        self.frames_padded = 0

    def polyphase(self, mi, k):
        return self.proto[mi + self.M2 * k]

    def _update_buf(self):
        convert = np.concatenate(
            [self.gsi.row(self.R2 - s - 1) for s in range(self.R2)]
        )
        self.buffer.next_sample(convert, reverse=True)

    def _push(self, src: BlockSource) -> bool:
        if self.frames_padded == 0:
            try:
                block = src.next()
                self.gsi.next_sample(block)
            except StopIteration:
                self.frames_padded += 1
                self.gsi.next_sample(None)
            self._update_buf()
        elif self.frames_padded < self.pd:
            self.gsi.next_sample(None)
            self._update_buf()
            self.frames_padded += 1
        else:
            return True
        return False

    def run(self, x: np.ndarray) -> np.ndarray:
        src = BlockSource(x, self.D)
        out = []
        while True:
            if self._push(src):
                break
            v = np.zeros(self.M2, complex)
            for mi in range(self.M2):
                s = 0.0
                flip = 1
                for k in range(self.m):
                    s += flip * self.polyphase(mi, k) * self.buffer.sample((self.r + 2) * k, mi)
                    flip *= -1
                v[mi] = self.w[mi] * s
            out.append(np.fft.ifft(v))  # normalized inverse (modulated.cc:704-711)
        return np.array(out)


class StreamPRSynthesis:
    """PerfectReconstructionFFTSynthesisBank (modulated.cc:761-898)."""

    def __init__(self, proto: np.ndarray, M: int, m: int, r: int):
        self.M, self.m, self.r = M, m, r
        self.M2 = 2 * M
        self.R = 1 << r
        self.R2 = 2 * self.R
        self.D = M // self.R
        self.proto = np.asarray(proto, np.float64)
        self.pd = 2 * m - 1
        self.buffer = RealBuffer(self.M2, m * (r + 2))
        self.gsi = RealBuffer(self.M2, self.R2)
        self.w = np.exp(+1j * np.pi * np.arange(self.M2) / self.M2)

    def polyphase(self, mi, k):
        return self.proto[mi + self.M2 * k]

    def _push(self, Y):
        c = np.real(np.fft.fft(Y) * self.w)
        self.buffer.next_sample(c)

    def run(self, Y: np.ndarray) -> np.ndarray:
        T = Y.shape[0]
        out = []
        fed = 0
        for _ in range(self.pd):
            self._push(Y[fed]); fed += 1
        while fed < T:
            self._push(Y[fed]); fed += 1
            s = np.zeros(self.M2)
            for mi in range(self.M2):
                flip = 1 if (self.m % 2 == 1) else -1
                acc = 0.0
                for k in range(self.m):
                    acc += flip * self.polyphase(mi, self.m - k - 1) * self.buffer.sample((self.r + 2) * k, mi)
                    flip *= -1
                s[mi] = acc
            self.gsi.next_sample(s)
            frame = np.zeros(self.D)
            for sx in range(self.R2):
                for d in range(self.D):
                    frame[self.D - d - 1] += self.gsi.sample(self.R2 - sx - 1, d + sx * self.D) / self.R
            out.append(frame)
        return np.concatenate(out)
