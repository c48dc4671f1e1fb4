"""``btk20.lms`` compatibility: frequency-domain block-LMS adaptive filter.

``FastBlockLMSFeature`` mirrors lms/lms.cc: per block of N samples, filter
the input with the current frequency-domain weights via overlap-save
(FFT size 2N), and on ``update()`` adapt the weights with the
power-normalized, gradient-constrained block-LMS recursion (Haykin's fast
block LMS).  ``next()`` emits the filtered block; ``update()`` must be
called explicitly, as in the reference driver pattern.

The per-step math is identical to the batched kernel
models/lti.fast_block_lms (same state layout: W [2N] frequency weights,
previous input block, recursive per-bin PSD D), so a next()+update() loop
reproduces that kernel's scan exactly.  Note the reference's own class
cannot be constructed as written (it dereferences a NULL impulse response
in the OverlapSave ctor, lms.cc:22 / convolution.cc:148); this node
provides the algorithm the code intends.
"""

from __future__ import annotations

import numpy as np

from .stream import FeatureStream

__all__ = ["FastBlockLMSFeature", "FastBlockLMSFeaturePtr"]


class FastBlockLMSFeature(FeatureStream):
    def __init__(self, desired, samp, alpha: float = 0.01, gamma: float = 0.9,
                 nm: str = "Fast Block LMS Feature"):
        N = samp.size()
        super().__init__(N, nm)
        self._desired = desired
        self._samp = samp
        self._N = N
        self._alpha = float(alpha)
        self._gamma = float(gamma)
        self._W = np.zeros(2 * N, np.complex128)
        self._D = np.full(2 * N, 1e-2, np.float64)
        self._u_prev = np.zeros(N, np.float64)
        self._U = None  # cached FFT of the current overlap-save input
        self._e = None  # cached error block for update()

    def _produce(self) -> np.ndarray:
        N = self._N
        u_b = np.asarray(self._samp.next(self._frame_no + 1), np.float64)
        d_b = np.asarray(self._desired.next(self._frame_no + 1), np.float64)
        U = np.fft.fft(np.concatenate([self._u_prev, u_b]))
        y = np.real(np.fft.ifft(self._W * U))[N:]
        self._e = d_b - y
        self._U = U
        self._u_prev = u_b
        return y.astype(np.float32)

    def error(self) -> np.ndarray:
        """Error block d - y of the current frame."""
        if self._e is None:
            raise RuntimeError("call next() first")
        return self._e

    def update(self) -> None:
        """Power-normalized gradient-constrained weight update
        (FastBlockLMSFeature::update, lms.cc:64-106)."""
        if self._U is None:
            raise RuntimeError("call next() first")
        N = self._N
        E = np.fft.fft(np.concatenate([np.zeros(N), self._e]))
        self._D = self._gamma * self._D + (1.0 - self._gamma) * np.abs(self._U) ** 2
        phi = np.fft.ifft(np.conj(self._U) * E / np.maximum(self._D, 1e-10))
        phi = np.concatenate([np.real(phi[:N]), np.zeros(N)])  # gradient constraint
        self._W = self._W + self._alpha * np.fft.fft(phi)

    def weights(self) -> np.ndarray:
        """Frequency-domain weights W [2N]."""
        return self._W

    def _reset(self):
        for s in (self._samp, self._desired):
            if hasattr(s, "reset"):
                s.reset()
        self._W = np.zeros(2 * self._N, np.complex128)
        self._D = np.full(2 * self._N, 1e-2, np.float64)
        self._u_prev = np.zeros(self._N, np.float64)
        self._U = None
        self._e = None


FastBlockLMSFeaturePtr = FastBlockLMSFeature
