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

__all__ = [
    "ZelinskiPostFilter",
    "ZelinskiPostFilterPtr",
    "McCowanPostFilter",
    "McCowanPostFilterPtr",
    "LefkimmiatisPostFilter",
    "LefkimmiatisPostFilterPtr",
]


class ZelinskiPostFilter(FeatureStream):
    def __init__(self, samp, fftlen: int, alpha: float = 0.6, type: int = 2,
                 min_frames: int = 0, name: str = "ZelinskiPostFilter",
                 csd_dtype=jnp.complex64):
        super().__init__(fftlen, name)
        self.samp = samp
        self._M = int(fftlen)
        self._F = self._M // 2 + 1
        self._alpha = float(alpha)
        # driver "subtype" 2 historically selects the |.| numerator variant;
        # pass the reference's raw bit flags for exact control
        self._type = int(type)
        self._min_frames = int(min_frames)
        # csd_dtype=complex128 (under jax.experimental.enable_x64) runs the
        # CSD recursion at the reference's double precision — the
        # error-budget mode that shows the ~55-60 dB float32 golden agreement
        # is pure accumulation rounding (tests/test_cpp_golden.py)
        self._csd_dtype = csd_dtype
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
            phi=jnp.zeros((self._F, C, C), self._csd_dtype),
            t=jnp.asarray(0, jnp.int32),
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


class _BufferedCoherencePostFilter(FeatureStream):
    """Common machinery for the coherence-model postfilters (McCowan,
    Lefkimmiatis): drain the upstream beamformer collecting per-frame
    snapshots, run the causal batched weight recursion once, replay rows.
    The recursion is frame-causal, so outputs equal a frame-by-frame run."""

    def __init__(self, samp, fftlen, alpha, type, min_frames, name):
        super().__init__(fftlen, name)
        self.samp = samp
        self._M = int(fftlen)
        self._F = self._M // 2 + 1
        self._alpha = float(alpha)
        self._type = int(type)
        self._min_frames = int(min_frames)
        self._bf = None
        self._Gamma = None
        self._loading = 0.0
        self._out = None
        self._i = 0

    def set_beamformer(self, beamformer) -> None:
        self._bf = beamformer

    def set_diffuse_noise_model(self, mpos, samplerate, sspeed: float = 343740.0) -> None:
        """Diffuse-field sinc coherence (McCowanPostFilter::set_diffuse_noise_model,
        postfilter.cc / beamformer.cc:2442-2509)."""
        from ..models.beamforming import diffuse_noise_coherence

        self._Gamma = np.asarray(
            diffuse_noise_coherence(np.asarray(mpos), self._M, float(samplerate), sspeed)
        )

    def set_all_diagonal_loading(self, load: float) -> None:
        self._loading = float(load)

    def _batch_filter(self, X, Y, wq, Gamma):  # -> [T, F]
        raise NotImplementedError

    def _produce(self) -> np.ndarray:
        if self._out is None:
            if self._bf is None or self._Gamma is None:
                raise RuntimeError("call set_beamformer() and set_diffuse_noise_model() first")
            Ys, Xs = [], []
            for frame in self.samp:
                Ys.append(np.asarray(frame, np.complex64))
                Xs.append(np.asarray(self._bf.last_snapshot))
            if not Ys:
                raise StopIteration
            Y = np.stack(Ys)[:, : self._F]  # [T, F]
            X = np.stack(Xs)  # [T, F, C]
            C = X.shape[-1]
            Gamma = self._Gamma + self._loading * np.eye(C, dtype=np.complex64)
            out = self._batch_filter(
                jnp.asarray(X), jnp.asarray(Y),
                jnp.asarray(np.asarray(self._bf.wq_manifold)), jnp.asarray(Gamma),
            )
            full = np.array(hermitian_mirror(out, self._M))
            # Reference quirk (verified vs the compiled C++): McCowan/
            # Lefkimmiatis copy only bins 0..M/2 of the beamformer output
            # into their frame and write the conjugate mirror ONLY on
            # applied frames (postfilter.cc:926-927, 889-894), so during
            # the warm-up (t <= min_frames) the upper half is the stale
            # vector_ content — zeros at stream start.
            warm = min(self._min_frames + 1, full.shape[0])
            full[:warm, self._F :] = 0.0
            self._out = full
            self._i = 0
        if self._i >= self._out.shape[0]:
            raise StopIteration
        row = self._out[self._i]
        self._i += 1
        return row

    def _reset(self):
        self._out = None
        self._i = 0
        if hasattr(self.samp, "reset"):
            self.samp.reset()


class McCowanPostFilter(_BufferedCoherencePostFilter):
    """McCowan postfilter stream (postfilter.h:123-162); ctor argument order
    matches the driver (test_online_beamforming.py:137-142)."""

    def __init__(self, samp, fftlen: int, alpha: float = 0.6, type: int = 2,
                 min_frames: int = 0, threshold_Rij: float = 0.99):
        super().__init__(samp, fftlen, alpha, type, min_frames, "McCowanPostFilter")
        self._threshold_Rij = float(threshold_Rij)

    def _batch_filter(self, X, Y, wq, Gamma):
        from ..models.postfilter import mccowan_postfilter

        return mccowan_postfilter(X, Y, wq, Gamma, self._alpha, self._type,
                                  self._min_frames, self._threshold_Rij)


class LefkimmiatisPostFilter(_BufferedCoherencePostFilter):
    """Lefkimmiatis Wiener postfilter stream (postfilter.h:174-202); ctor
    order per the driver (test_online_beamforming.py:144-151)."""

    def __init__(self, samp, fftlen: int, min_sv: float = 1.0e-8,
                 fbin_no1: int = 128, alpha: float = 0.8, type: int = 2,
                 min_frames: int = 0, threshold_Rij: float = 0.99):
        super().__init__(samp, fftlen, alpha, type, min_frames, "LefkimmiatisPostFilter")
        self._min_sv = float(min_sv)
        self._fbin_no1 = int(fbin_no1)
        self._threshold_Rij = float(threshold_Rij)

    def calc_inverse_noise_spatial_spectral_matrix(self) -> None:
        """Reference precomputes Gamma^-1 here (postfilter.h:187); the batched
        kernel inverts inside `lefkimmiatis_postfilter` — kept as a no-op."""

    def _batch_filter(self, X, Y, wq, Gamma):
        from ..models.postfilter import lefkimmiatis_postfilter

        return lefkimmiatis_postfilter(X, Y, wq, Gamma, self._alpha, self._type,
                                       self._min_frames, self._threshold_Rij,
                                       self._min_sv, self._fbin_no1)


McCowanPostFilterPtr = McCowanPostFilter
LefkimmiatisPostFilterPtr = LefkimmiatisPostFilter
