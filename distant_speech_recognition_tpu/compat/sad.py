"""``btk20.sad`` compatibility: speech-activity-detector streams.

Mirrors sad/sad.h: the boolean-decision ``VAD`` tower (SimpleEnergyVAD,
SimpleLikelihoodRatioVAD), the frame-gating ``EnergyVADFeature``, and
``NeuralNetVAD`` (MLP on context-stacked cepstra).  The recursions are the
same ones as the batched kernels in models/sad.py (simple_energy_vad,
simple_likelihood_ratio_vad, MLPVad), computed one frame at a time in
numpy so the node can sit inside a pull graph.
"""

from __future__ import annotations

import numpy as np

from .stream import FeatureStream

__all__ = [
    "VAD",
    "SimpleEnergyVAD",
    "SimpleEnergyVADPtr",
    "SimpleLikelihoodRatioVAD",
    "SimpleLikelihoodRatioVADPtr",
    "EnergyVADFeature",
    "EnergyVADFeaturePtr",
    "NeuralNetVAD",
    "NeuralNetVADPtr",
]


class VAD:
    """Boolean-decision base (sad.h:66-88): ``next()`` returns True for
    speech; ``frame()`` exposes the spectrum the decision was made on."""

    def __init__(self, samp):
        self.samp = samp
        self._frame_no = -1
        self._is_speech = False
        self._frame = None

    def frame(self):
        return self._frame

    def frame_no(self) -> int:
        return self._frame_no

    def next(self, frame_no: int = -5) -> bool:
        if frame_no >= 0 and frame_no == self._frame_no:
            return self._is_speech
        samp = np.asarray(self.samp.next(self._frame_no + 1))
        self._frame = samp
        self._is_speech = self._decide(samp)
        self._frame_no += 1
        return self._is_speech

    def reset(self):
        self._frame_no = -1
        if hasattr(self.samp, "reset"):
            self.samp.reset()
        self._reset()

    def next_speaker(self):
        raise NotImplementedError

    def _decide(self, samp) -> bool:
        raise NotImplementedError

    def _reset(self):
        pass

    # legacy alias
    def nextSpeaker(self):
        self.next_speaker()


class SimpleEnergyVAD(VAD):
    """Energy-ratio VAD (SimpleEnergyVAD::next, sad.cc:155-175): speech when
    the current spectral energy exceeds ``threshold`` times its recursive
    average (forgetting factor ``gamma``)."""

    def __init__(self, samp, threshold: float, gamma: float = 0.995):
        super().__init__(samp)
        self._threshold = float(threshold)
        self._gamma = float(gamma)
        self._spectral_energy = 0.0

    def _decide(self, samp) -> bool:
        e = float(np.sum(np.abs(samp) ** 2))
        self._spectral_energy = self._gamma * self._spectral_energy + (1.0 - self._gamma) * e
        if self._spectral_energy == 0.0:
            # all-zero stream so far: the reference computes 0/0 = NaN and
            # NaN > threshold is false (sad.cc:171-173) — return non-speech
            return False
        return (e / self._spectral_energy) > self._threshold

    def next_speaker(self):
        self._spectral_energy = 0.0
        self.reset()

    def _reset(self):
        self._spectral_energy = 0.0


SimpleEnergyVADPtr = SimpleEnergyVAD


def _hyp1f1_m05_1(x: np.ndarray) -> np.ndarray:
    """1F1(-1/2, 1, -x) = (1+x) I0e(x/2) + x I1e(x/2) (the Ephraim-Malah
    gain kernel; same identity as models/sad._hyp1f1_m05_1)."""
    from scipy.special import i0e, i1e

    half = x / 2.0
    return (1.0 + x) * i0e(half) + x * i1e(half)


class SimpleLikelihoodRatioVAD(VAD):
    """Ephraim-Malah likelihood-ratio VAD
    (SimpleLikelihoodRatioVAD::next, sad.cc:231-264): decision-directed
    a-priori SNR with the previous MMSE amplitude estimate per bin."""

    def __init__(self, samp, threshold: float, alpha: float = 0.98):
        super().__init__(samp)
        self._threshold = float(threshold)
        self._alpha = float(alpha)
        self._variance = None
        self._prev_Ak = None

    def set_variance(self, variance) -> None:
        """Noise variance per bin.  The previous-amplitude state is
        initialized to the noise floor only the FIRST time (sad.cc:213-218);
        later calls update the variance but preserve the adaptive prev_Ak,
        so periodic noise re-estimation doesn't reset the decision-directed
        SNR recursion."""
        first = self._variance is None
        self._variance = np.asarray(variance, np.float64)
        if first:
            self._prev_Ak = np.sqrt(self._variance)

    def _decide(self, samp) -> bool:
        if self._variance is None:
            raise RuntimeError("must set noise variance before calling next()")
        lam = self._variance
        Rk = np.abs(np.asarray(samp, np.complex128))
        gammak = Rk * Rk / lam
        xik = self._alpha * (self._prev_Ak**2 / lam) + (1.0 - self._alpha) * np.maximum(
            gammak - 1.0, 0.0
        )
        vk = (xik / (1.0 + xik)) * gammak
        Ak = (
            (np.sqrt(np.pi) / 2.0)
            * (np.sqrt(vk) / np.maximum(gammak, 1e-20))
            * _hyp1f1_m05_1(vk)
            * Rk
        )
        self._prev_Ak = Ak
        logLR = float(np.sum(-np.log1p(xik) + gammak * xik / (1.0 + xik)))
        return (logLR / Rk.shape[0]) > self._threshold

    def next_speaker(self):
        if self._variance is not None:
            self._prev_Ak = np.sqrt(self._variance)
        self.reset()

    def _reset(self):
        if self._variance is not None:
            self._prev_Ak = np.sqrt(self._variance)

    # legacy alias
    def setVariance(self, variance):
        self.set_variance(variance)


SimpleLikelihoodRatioVADPtr = SimpleLikelihoodRatioVAD


class EnergyVADFeature(FeatureStream):
    """Utterance-gating stream (EnergyVADFeature, sad.cc:295-438): buffer
    blocks until ``bufferLength`` consecutive blocks exceed an adaptive
    median-energy threshold, then replay the buffered head and pass blocks
    through until ``bufferLength`` consecutive blocks fall below it.

    The adaptive threshold is the ``threshold``-quantile of a sliding
    window of ``energiesN`` recent block energies (initialized to +inf, so
    nothing passes until the window fills with real energies)."""

    def __init__(self, source, threshold: float = 0.5, bufferLength: int = 30,
                 energiesN: int = 200, nm: str = "Energy VAD"):
        super().__init__(source.size(), nm)
        self.source = source
        self._bufferLen = int(bufferLength)
        self._energiesN = int(energiesN)
        self._medianX = int(threshold * energiesN)
        self._energies = np.full(self._energiesN, np.inf)
        self._buffer: list[np.ndarray] = []
        self._recognizing = False
        self._above_n = 0
        self._below_n = 0

    def _above_threshold(self, vector: np.ndarray) -> bool:
        s = float(np.dot(vector, vector))
        sorted_e = np.sort(self._energies)
        if not self._recognizing and self._above_n == 0:
            self._energies[:-1] = self._energies[1:]
            self._energies[-1] = s
        return s > sorted_e[self._medianX]

    def _produce(self) -> np.ndarray:
        if self._recognizing:
            if self._buffer:
                return self._buffer.pop(0)
            vector = np.asarray(self.source.next(), np.float32)
            if self._above_threshold(vector):
                self._below_n = 0
            else:
                if self._below_n == self._bufferLen:
                    raise StopIteration  # jiterator_error("end of samples!")
                self._below_n += 1
            return vector
        # buffering until enough consecutive blocks are above threshold
        while True:
            vector = np.asarray(self.source.next(), np.float32)
            self._buffer.append(vector.copy())
            if len(self._buffer) > self._bufferLen:
                self._buffer.pop(0)
            if self._above_threshold(vector):
                if self._above_n == self._bufferLen:
                    self._recognizing = True
                    return self._buffer.pop(0)
                self._above_n += 1
            else:
                self._above_n = 0

    def next_speaker(self):
        self._energies[:] = np.inf

    def _reset(self):
        # the reference deliberately does NOT reset the source (sad.cc:326)
        self._buffer = []
        self._recognizing = False
        self._above_n = 0
        self._below_n = 0

    # legacy alias
    def nextSpeaker(self):
        self.next_speaker()


EnergyVADFeaturePtr = EnergyVADFeature


class NeuralNetVAD:
    """MLP speech/non-speech on context-stacked cepstra
    (NeuralNetVAD, sad.h:32-61; the MLP forward pass is
    sad/neural_spnsp_det.c:34-72).  Per-frame twin of models/sad.MLPVad:
    the decision for frame ``t`` sees the center-aligned window
    ``[t-context .. t+context]`` (the node pulls ``context`` frames ahead),
    edge-padded at both stream ends exactly as the reference's priming and
    ``framesPadded_`` protocol do (sad.cc:77-124)."""

    def __init__(self, cep, context: int = 4, hiddenUnitsN: int = 1000,
                 outputUnitsN: int = 2, threshold: float = 0.1,
                 neuralNetFile: str = ""):
        from ..models.sad import MLPVad

        self.cep = cep
        self._context = int(context)
        self._threshold = float(threshold)
        self._mlp_cls = MLPVad
        self._mlp = None
        self._frame_no = -1
        self._is_speech = False
        self._window: list[np.ndarray] = []
        self._padded = 0
        if neuralNetFile:
            self.read(neuralNetFile)

    def read(self, neuralNetFile: str) -> None:
        """Load MLP weights from a .npz with W1/b1/W2/b2 arrays."""
        data = np.load(neuralNetFile)
        self._mlp = self._mlp_cls(
            W1=data["W1"], b1=data["b1"], W2=data["W2"], b2=data["b2"],
            threshold=self._threshold, context=self._context,
        )

    def set_weights(self, W1, b1, W2, b2) -> None:
        self._mlp = self._mlp_cls(
            W1=np.asarray(W1), b1=np.asarray(b1),
            W2=np.asarray(W2), b2=np.asarray(b2),
            threshold=self._threshold, context=self._context,
        )

    def _pull_or_pad(self):
        """Pull the next cepstral frame; at end of stream repeat the last
        frame up to ``context`` times, then signal EOF
        (NeuralNetVAD::update_buffer_, sad.cc:77-108)."""
        if self._padded == 0:
            try:
                return np.asarray(self.cep.next(), np.float32)
            except StopIteration:
                self._padded = 1
                return self._window[-1]
        if self._padded < self._context:
            self._padded += 1
            return self._window[-1]
        raise StopIteration

    def next(self, frame_no: int = -5) -> bool:
        if self._mlp is None:
            raise RuntimeError("load MLP weights first (read() or set_weights())")
        if frame_no >= 0 and frame_no == self._frame_no:
            return self._is_speech
        c = self._context
        if not self._window:
            # prime: c copies of frame 0 (left edge padding) + frames 0..c-1
            # (NeuralNetVAD::next priming loops, sad.cc:119-124 — the repeated
            # next(0) calls hit the upstream frame cache, so frame 0 is
            # produced once)
            f0 = np.asarray(self.cep.next(), np.float32)
            self._window = [f0] * (c + 1)
            for _ in range(c - 1):
                self._window.append(self._pull_or_pad())
        # decision t sees the center-aligned window [t-c .. t+c]: pull t+c
        self._window.append(self._pull_or_pad())
        if len(self._window) > 2 * c + 1:
            self._window.pop(0)
        x = np.concatenate(self._window)
        hdn = 1.0 / (1.0 + np.exp(-(x @ np.asarray(self._mlp.W1) + self._mlp.b1)))
        logits = hdn @ np.asarray(self._mlp.W2) + self._mlp.b2
        p = np.exp(logits - logits.max())
        p /= p.sum()
        self._is_speech = bool((p[0] - p[1]) > self._threshold)
        self._frame_no += 1
        return self._is_speech

    def reset(self):
        self._frame_no = -1
        self._window = []
        self._padded = 0
        if hasattr(self.cep, "reset"):
            self.cep.reset()


NeuralNetVADPtr = NeuralNetVAD
