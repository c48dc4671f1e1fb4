"""``btk20.aec`` compatibility: echo-cancellation features as pull streams.

Each class takes the *played* (far-end reference) and *recorded* analysis
banks — the reference's argument order (test_subband_aec.py:49-90) — drains
both in lockstep on first pull, runs the batched per-bin scan
(models/aec.py, golden-tested against the reference recursions), and
replays the echo-cancelled frames.  Keyword names match the drivers 1:1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import aec as maec
from ..ops.filterbank import hermitian_mirror
from .stream import FeatureStream

__all__ = [
    "NLMSAcousticEchoCancellationFeature",
    "NLMSAcousticEchoCancellationFeaturePtr",
    "KalmanFilterEchoCancellationFeature",
    "KalmanFilterEchoCancellationFeaturePtr",
    "BlockKalmanFilterEchoCancellationFeature",
    "BlockKalmanFilterEchoCancellationFeaturePtr",
    "InformationFilterEchoCancellationFeature",
    "InformationFilterEchoCancellationFeaturePtr",
    "SquareRootInformationFilterEchoCancellationFeature",
    "SquareRootInformationFilterEchoCancellationFeaturePtr",
    "DTDBlockKalmanFilterEchoCancellationFeature",
    "DTDBlockKalmanFilterEchoCancellationFeaturePtr",
]


class _AECFeature(FeatureStream):
    def __init__(self, played, recorded, name):
        super().__init__(recorded.size(), name)
        self.played = played
        self.recorded = recorded
        self._out = None
        self._i = 0

    def _run(self, Vh: jnp.ndarray, Ah: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def _produce(self) -> np.ndarray:
        if self._out is None:
            V = np.stack([np.asarray(f) for f in self.played])  # [T, M]
            A = np.stack([np.asarray(f) for f in self.recorded])
            T = min(V.shape[0], A.shape[0])
            M = A.shape[-1]
            F = M // 2 + 1
            E = self._run(jnp.asarray(V[:T, :F]), jnp.asarray(A[:T, :F]))
            self._out = np.asarray(hermitian_mirror(E, M))
            self._i = 0
        if self._i >= self._out.shape[0]:
            raise StopIteration
        row = self._out[self._i]
        self._i += 1
        return row

    def _reset(self):
        self._out = None
        self._i = 0
        for s in (self.played, self.recorded):
            if hasattr(s, "reset"):
                s.reset()


class NLMSAcousticEchoCancellationFeature(_AECFeature):
    def __init__(self, played, recorded, delta: float = 100.0,
                 epsilon: float = 1.0e-4, threshold: float = 100.0):
        super().__init__(played, recorded, "NLMSAcousticEchoCancellationFeature")
        self._kw = dict(delta=delta, epsilon=epsilon, threshold=threshold)

    def _run(self, V, A):
        return maec.nlms_aec(V, A, **self._kw)[0]


class KalmanFilterEchoCancellationFeature(_AECFeature):
    def __init__(self, played, recorded, beta: float = 0.95,
                 sigma2: float = 10.0e-4, threshold: float = 100.0):
        super().__init__(played, recorded, "KalmanFilterEchoCancellationFeature")
        self._kw = dict(beta=beta, sigma2=sigma2, threshold=threshold)

    def _run(self, V, A):
        return maec.kalman_aec(V, A, **self._kw)[0]


class BlockKalmanFilterEchoCancellationFeature(_AECFeature):
    def __init__(self, played, recorded, sample_num: int = 1, beta: float = 0.95,
                 sigmau2: float = 10.0e-4, sigmak2: float = 5.0,
                 energy_threshold: float = 100.0, amp4play: float = 1.0):
        super().__init__(played, recorded, "BlockKalmanFilterEchoCancellationFeature")
        self._kw = dict(sampleN=sample_num, beta=beta, sigmau2=sigmau2,
                        sigmak2=sigmak2, threshold=energy_threshold,
                        amp4play=amp4play)

    def _run(self, V, A):
        return maec.block_kalman_aec(V, A, **self._kw)[0]


class InformationFilterEchoCancellationFeature(_AECFeature):
    def __init__(self, played, recorded, sample_num: int = 2, beta: float = 0.95,
                 sigmau2: float = 10.0e-4, sigmak2: float = 5.0,
                 snr_threshold: float = 0.01, energy_threshold: float = 100.0,
                 smooth: float = 0.9, loading: float = 1.0e-2,
                 amp4play: float = 1.0):
        super().__init__(played, recorded, "InformationFilterEchoCancellationFeature")
        self._kw = dict(sampleN=sample_num, beta=beta, sigmau2=sigmau2,
                        sigmak2=sigmak2, snr_th=snr_threshold,
                        eng_th=energy_threshold, smooth=smooth,
                        loading=loading, amp4play=amp4play)

    def _run(self, V, A):
        return maec.information_filter_aec(V, A, **self._kw)[0]


class SquareRootInformationFilterEchoCancellationFeature(_AECFeature):
    def __init__(self, played, recorded, sample_num: int = 2, beta: float = 0.95,
                 sigmau2: float = 10.0e-4, sigmak2: float = 5.0,
                 snr_threshold: float = 0.01, energy_threshold: float = 100.0,
                 smooth: float = 0.9, loading: float = 1.0e-2,
                 amp4play: float = 1.0):
        # sigmak2 accepted for driver compatibility; the square-root form
        # parameterizes the initial information matrix via `loading` instead
        # (aec.cc:615-790).
        super().__init__(played, recorded,
                         "SquareRootInformationFilterEchoCancellationFeature")
        self._kw = dict(sampleN=sample_num, beta=beta, sigmau2=sigmau2,
                        snr_th=snr_threshold, eng_th=energy_threshold,
                        smooth=smooth, loading=loading, amp4play=amp4play)

    def _run(self, V, A):
        return maec.sqrt_information_filter_aec(V, A, **self._kw)[0]


class DTDBlockKalmanFilterEchoCancellationFeature(_AECFeature):
    def __init__(self, played, recorded, sample_num: int = 1, beta: float = 0.95,
                 sigmau2: float = 10.0e-4, sigmak2: float = 5.0,
                 snr_threshold: float = 2.0, energy_threshold: float = 100.0,
                 smooth: float = 0.9, amp4play: float = 1.0):
        super().__init__(played, recorded,
                         "DTDBlockKalmanFilterEchoCancellationFeature")
        self._kw = dict(sampleN=sample_num, beta=beta, sigmau2=sigmau2,
                        sigmak2=sigmak2, snr_th=snr_threshold,
                        eng_th=energy_threshold, smooth=smooth,
                        amp4play=amp4play)

    def _run(self, V, A):
        return maec.dtd_block_kalman_aec(V, A, **self._kw)[0]


NLMSAcousticEchoCancellationFeaturePtr = NLMSAcousticEchoCancellationFeature
KalmanFilterEchoCancellationFeaturePtr = KalmanFilterEchoCancellationFeature
BlockKalmanFilterEchoCancellationFeaturePtr = BlockKalmanFilterEchoCancellationFeature
InformationFilterEchoCancellationFeaturePtr = InformationFilterEchoCancellationFeature
SquareRootInformationFilterEchoCancellationFeaturePtr = (
    SquareRootInformationFilterEchoCancellationFeature
)
DTDBlockKalmanFilterEchoCancellationFeaturePtr = (
    DTDBlockKalmanFilterEchoCancellationFeature
)
