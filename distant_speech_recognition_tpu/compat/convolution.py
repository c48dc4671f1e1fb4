"""``btk20.convolution`` compatibility: block-convolution LTI streams.

``OverlapAdd`` and ``OverlapSave`` reproduce convolution/convolution.cc
frame-for-frame: per block, real FFT -> multiply with the cached frequency
response -> inverse FFT -> the reference's buffer protocol (carry tail of
length P-1 for overlap-add; discard the circularly-corrupted head for
overlap-save).  The batched equivalents are models/lti.overlap_add_filter /
overlap_save_filter; these nodes exist for pull-graph drivers
(e.g. unit_test scripts using OverlapAddPtr).
"""

from __future__ import annotations

import numpy as np

from .stream import FeatureStream

__all__ = [
    "OverlapAdd",
    "OverlapAddPtr",
    "OverlapSave",
    "OverlapSavePtr",
]


def _next_pow2_at_least(n: int) -> int:
    fftlen = 1
    while fftlen < n:
        fftlen *= 2
    return fftlen


class OverlapAdd(FeatureStream):
    """Overlap-add FIR filtering of a float stream
    (OverlapAdd, convolution.cc:26-141).

    ``samp``: upstream float stream of block length L; ``impulseResponse``:
    P taps; ``fftLen``: 0 selects the smallest power of two >= L+P-1.
    Emits L samples per frame (steady-state linear convolution).
    """

    def __init__(self, samp, impulseResponse=None, fftLen: int = 0,
                 nm: str = "OverlapAdd"):
        L = samp.size()
        super().__init__(L, nm)
        self.samp = samp
        self._L = L
        h = np.zeros(1) if impulseResponse is None else np.asarray(impulseResponse, np.float64)
        self._P = h.shape[0]
        need = self._L + self._P - 1
        if fftLen == 0:
            self._N = _next_pow2_at_least(need)
        else:
            if fftLen < need:
                raise ValueError(
                    f"section ({L}) and impulse response ({self._P}) lengths "
                    f"inconsistent with FFT length ({fftLen})"
                )
            self._N = int(fftLen)
        self.set_impulse_response_(None if impulseResponse is None else h)
        self._buffer = np.zeros(self._L + self._P - 1, np.float64)

    def set_impulse_response_(self, impulseResponse) -> None:
        if impulseResponse is None:
            self._H = np.zeros(self._N // 2 + 1, np.complex128)
        else:
            self._H = np.fft.rfft(np.asarray(impulseResponse, np.float64), n=self._N)
        self._buffer = np.zeros(self._L + self._P - 1, np.float64)

    def _produce(self) -> np.ndarray:
        block = np.asarray(self.samp.next(self._frame_no + 1), np.float64)
        sect = np.fft.irfft(np.fft.rfft(block, n=self._N) * self._H, n=self._N)
        self._buffer += sect[: self._L + self._P - 1]
        out = self._buffer[: self._L].astype(np.float32)
        # shift down (convolution.cc:122-127)
        self._buffer[: self._P - 1] = self._buffer[self._L : self._L + self._P - 1]
        self._buffer[self._P - 1 :] = 0.0
        return out

    def _reset(self):
        if hasattr(self.samp, "reset"):
            self.samp.reset()
        self._buffer[:] = 0.0


OverlapAddPtr = OverlapAdd


class OverlapSave(FeatureStream):
    """Overlap-save FIR filtering (OverlapSave, convolution.cc:145-245):
    FFT length = the upstream block length L, output L-P samples per frame
    (the linearly-convolved portion ``section[P:L]``).

    ``update(delta)`` adds a frequency-domain increment to the cached
    response — the FastBlockLMS adaptation hook.  The reference declares the
    response buffer half-complex but updates all L bins (an out-of-bounds
    write, convolution.cc:233-244); here the response is stored full-length
    so the update is well-defined, and filtering uses bins 0..L/2 exactly as
    the reference's halfcomplex multiply does.
    """

    def __init__(self, samp, impulseResponse=None, nm: str = "OverlapSave"):
        L = samp.size()
        h = None if impulseResponse is None else np.asarray(impulseResponse, np.float64)
        P = 0 if h is None else h.shape[0]
        if h is not None and P >= L:
            raise ValueError(f"cannot have P = {P} and L = {L}")
        super().__init__(L - P, nm)
        self.samp = samp
        self._L = L
        self._P = P
        self.set_impulse_response_(h)

    def set_impulse_response_(self, impulseResponse) -> None:
        if impulseResponse is None:
            self._H = np.zeros(self._L, np.complex128)
        else:
            self._H = np.fft.fft(
                np.pad(np.asarray(impulseResponse, np.float64), (0, self._L - self._P))
            )

    def update(self, delta) -> None:
        """Add a full-length frequency-domain increment (convolution.cc:233)."""
        delta = np.asarray(delta, np.complex128)
        if delta.shape[0] != self._L:
            raise ValueError(
                f"dimension of update vector ({delta.shape[0]}) does not match "
                f"frequency response ({self._L})"
            )
        self._H = self._H + delta

    def _produce(self) -> np.ndarray:
        block = np.asarray(self.samp.next(self._frame_no + 1), np.float64)
        # halfcomplex multiply: only bins 0..L/2 of the response are used,
        # with hermitian extension (convolution.cc:210-219) — a
        # non-hermitian update() therefore acts through its lower half only
        sect = np.fft.irfft(
            np.fft.rfft(block, n=self._L) * self._H[: self._L // 2 + 1], n=self._L
        )
        return sect[self._P : self._L].astype(np.float32)

    def _reset(self):
        if hasattr(self.samp, "reset"):
            self.samp.reset()


OverlapSavePtr = OverlapSave
