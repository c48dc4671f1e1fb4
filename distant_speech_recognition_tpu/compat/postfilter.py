"""``btk20.postfilter`` compatibility: Zelinski-family postfilters as streams.

``ZelinskiPostFilter`` mirrors postfilter.h:74-110: a stream node that taps
the upstream beamformer's snapshot array + array manifold (``set_beamformer``)
and applies the recursive-CSD Wiener weight per frame.  It drives the exact
same jitted step as the streaming/batched paths
(models/streaming._zelinski_step_factory), so compat output == batch output.

Subtype mapping follows the reference driver convention
(test_online_beamforming.py:133-136 passes ``subtype`` straight through to
the C++ type flags, postfilter.h TYPE_ZELINSKI1_REAL=1/ABS=2/ZELINSKI2=8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.streaming import _CSDState, _zelinski_step_factory
from ..ops.filterbank import hermitian_mirror
from .stream import FeatureStream

__all__ = ["ZelinskiPostFilter", "ZelinskiPostFilterPtr"]


class ZelinskiPostFilter(FeatureStream):
    def __init__(self, samp, fftlen: int, alpha: float = 0.6, type: int = 2,
                 min_frames: int = 0, name: str = "ZelinskiPostFilter"):
        super().__init__(fftlen, name)
        self.samp = samp
        self._M = int(fftlen)
        self._F = self._M // 2 + 1
        self._alpha = float(alpha)
        # driver "subtype" 2 historically selects the |.| numerator variant;
        # pass the reference's raw bit flags for exact control
        self._type = int(type)
        self._min_frames = int(min_frames)
        self._bf = None
        self._step = None
        self._state = None

    def set_beamformer(self, beamformer) -> None:
        """Tap the beamformer's snapshots + manifold (postfilter.h:86-88).

        Accepts a compat ``SubbandBeamformer`` (or any object exposing
        ``last_snapshot [F, C]`` and ``wq_manifold [F, C]``)."""
        self._bf = beamformer
        wq = jnp.asarray(np.asarray(beamformer.wq_manifold))
        self._step = jax.jit(
            _zelinski_step_factory(wq, self._alpha, self._type, self._min_frames)
        )
        C = wq.shape[-1]
        self._state = _CSDState(
            phi=jnp.zeros((self._F, C, C), jnp.complex64), t=jnp.asarray(0, jnp.int32)
        )

    def set_snapshot_source(self, beamformer) -> None:  # explicit-setter path
        self.set_beamformer(beamformer)

    def _produce(self) -> np.ndarray:
        if self._step is None:
            raise RuntimeError("call set_beamformer() first")
        Y = np.asarray(self.samp.next(self._frame_no + 1), np.complex64)
        X = jnp.asarray(self._bf.last_snapshot)
        self._state, Yh = self._step(self._state, (X, jnp.asarray(Y[: self._F])))
        return np.asarray(hermitian_mirror(Yh, self._M))

    def _reset(self):
        if hasattr(self.samp, "reset"):
            self.samp.reset()
        if self._bf is not None:
            self.set_beamformer(self._bf)


ZelinskiPostFilterPtr = ZelinskiPostFilter
