"""``lib/pybeamformer.py`` compatibility: subband beamformers as pull streams.

Each class pulls one frame from every channel's analysis bank, assembles the
per-bin snapshots (SnapShotArray semantics, beamformer.cc:62), beamforms bins
``0..M/2`` and conjugate-mirrors the rest (beamformer.cc:1142-1152), yielding
a full-M complex vector — byte-compatible with what the reference's python
beamformers hand to ``PyVectorComplexFeatureStream``.

Constructor keyword arguments match the reference classes 1:1
(pybeamformer.py:595-607 / 770-783); the adaptive variants drive the exact
same jitted step functions as the batched scans (models/adaptive_gsc.py), so
compat output == batch pipeline output (tests/test_compat.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import beamforming as bf
from ..models.adaptive_gsc import (
    GSCLMSConfig,
    GSCRLSConfig,
    _LMSState,
    _lms_step_factory,
    rls_init_state,
    _rls_step_factory,
    gsc_weights,
)
from ..ops.filterbank import hermitian_mirror
from ..utils.geometry import (  # noqa: F401  (re-exported, reference module surface)
    calc_ca_delays,
    calc_delays,
    calc_la_delays,
    calc_nf_delays,
    calc_pa_delays,
)
from .stream import FeatureStream

__all__ = [
    "SubbandBeamformer",
    "SubbandGSCBeamformer",
    "SubbandMVDRBeamformer",
    "SubbandGSCLMSBeamformer",
    "SubbandGSCRLSBeamformer",
    "calc_delays",
]


class SubbandBeamformer(FeatureStream):
    """Base: snapshot assembly + weight save/load (pybeamformer.py:380-477)."""

    def __init__(self, spec_sources, name: str = "SubbandBeamformer"):
        self._srcs = list(spec_sources)
        M = self._srcs[0].size()
        super().__init__(M, name)
        self._M = M
        self._F = M // 2 + 1
        self._C = len(self._srcs)
        # exposed for postfilters tapping the beamformer (ZelinskiPostFilter
        # set_beamformer path, postfilter.h:74-110)
        self.last_snapshot: np.ndarray | None = None  # [F, C]
        self.wq_manifold: np.ndarray | None = None  # [F, C] ta_ (e^{-j.} conv.)
        self.wqH: np.ndarray | None = None
        self.BmH: np.ndarray | None = None

    def chan_num(self) -> int:
        return self._C

    def beamformer(self):
        """The reference returns its internal C++ node here
        (pybeamformer.py:406); compat postfilters accept the object itself."""
        return self

    def _pull_snapshots(self):
        frames = np.stack(
            [np.asarray(s.next(self._frame_no + 1)) for s in self._srcs]
        )  # [C, M]
        X = frames[:, : self._F].T.copy()  # [F, C] snapshot per bin
        energy = float(np.sum(np.abs(frames[0]) ** 2) / self._M)
        self.last_snapshot = X
        return X, energy

    def save_active_weights(self, path: str):
        np.save(path, np.zeros((self._F, 0), np.complex64))

    def _reset(self):
        for s in self._srcs:
            s.reset()


class SubbandGSCBeamformer(SubbandBeamformer):
    """Fixed-weight GSC: D&S quiescent (Nc=1) or LCMV null-steering (Nc=2),
    wa = 0 (pybeamformer.py:478-537)."""

    def __init__(self, spec_sources, Nc: int = 1):
        super().__init__(spec_sources, "SubbandGSCBeamformer")
        self._Nc = int(Nc)

    def calc_beamformer_weights(self, samplerate, delays_t):
        wqH, BmH = gsc_weights(self._M, float(samplerate), np.asarray(delays_t), Nc=1)
        self.wqH, self.BmH = np.asarray(wqH), np.asarray(BmH)
        self.wq_manifold = np.conj(self.wqH)  # ta_ (beamformer.cc:960-965)
        return self.wqH

    def calc_beamformer_weights_n(self, samplerate, delays_t, delays_js):
        """LCMV: distortionless to the target, nulls on the jammers
        (calc_lcmv_weight, pybeamformer.py:344-379)."""
        delays_js = np.atleast_2d(np.asarray(delays_js))
        vs_t = bf.array_manifold(self._M, float(samplerate), np.asarray(delays_t))
        cons = [vs_t] + [
            bf.array_manifold(self._M, float(samplerate), d) for d in delays_js
        ]
        constraints = jnp.stack(cons, axis=-2)  # [F, Nc, C]
        gains = jnp.asarray([1.0] + [0.0] * len(delays_js))
        self.wqH = np.asarray(bf.lcmv_weights(constraints, gains))
        self.wq_manifold = np.asarray(vs_t)  # ta_ (beamformer.cc:960-965)
        self.BmH = np.asarray(bf.blocking_matrix(vs_t, Nc=1)).transpose(0, 2, 1)
        return self.wqH

    def _produce(self) -> np.ndarray:
        X, _ = self._pull_snapshots()
        Y = np.einsum("fc,fc->f", self.wqH, X)
        return np.asarray(hermitian_mirror(jnp.asarray(Y), self._M))


class SubbandMVDRBeamformer(SubbandBeamformer):
    """Super-directive MVDR (pybeamformer.py:538-587)."""

    def __init__(self, spec_sources):
        super().__init__(spec_sources, "SubbandMVDRBeamformer")

    def calc_sd_beamformer_weights(self, samplerate, delays_t, mpos,
                                   sspeed: float = 343740.0, mu: float = 0.01):
        delays_t = np.asarray(delays_t)
        self.wqH = np.asarray(
            bf.superdirective_weights(np.asarray(mpos), delays_t, self._M,
                                      float(samplerate), sspeed=sspeed, mu=mu)
        )
        self.wq_manifold = np.asarray(
            bf.array_manifold(self._M, float(samplerate), delays_t)
        )  # ta_ (beamformer.cc:960-965)
        return self.wqH

    def _produce(self) -> np.ndarray:
        X, _ = self._pull_snapshots()
        Y = np.einsum("fc,fc->f", self.wqH, X)
        return np.asarray(hermitian_mirror(jnp.asarray(Y), self._M))


class _AdaptiveGSCBase(SubbandBeamformer):
    _config_cls = None
    _state_builder = None
    _step_builder = None

    def __init__(self, spec_sources, name, **kwargs):
        super().__init__(spec_sources, name)
        fields = {f.name for f in dataclasses.fields(self._config_cls)}
        unknown = set(kwargs) - fields
        if unknown:
            raise TypeError(f"unknown {self._config_cls.__name__} options: {unknown}")
        self._cfg = self._config_cls(**kwargs)
        self._step = None
        self._state = None

    def calc_beamformer_weights(self, samplerate, delays_t):
        wqH, BmH = gsc_weights(self._M, float(samplerate), np.asarray(delays_t), Nc=1)
        self.wqH, self.BmH = np.asarray(wqH), np.asarray(BmH)
        self.wq_manifold = np.conj(self.wqH)  # ta_ (beamformer.cc:960-965)
        step = type(self)._make_step(self._cfg, jnp.asarray(wqH), jnp.asarray(BmH))
        self._step = jax.jit(step)
        if self._state is None:  # look-direction change keeps adaptive state
            self._state = type(self)._make_state(self._cfg, self._F, self.BmH.shape[1])
        return self.wqH

    def _produce(self) -> np.ndarray:
        if self._step is None:
            raise RuntimeError("call calc_beamformer_weights() first")
        X, energy = self._pull_snapshots()
        self._state, Y = self._step(
            self._state, (jnp.asarray(X), jnp.asarray(energy, jnp.float32))
        )
        return np.asarray(hermitian_mirror(Y, self._M))

    def _reset(self):
        super()._reset()
        if self._state is not None and self.BmH is not None:
            self._state = type(self)._make_state(self._cfg, self._F, self.BmH.shape[1])


class SubbandGSCLMSBeamformer(_AdaptiveGSCBase):
    """Leaky power-normalized LMS GSC (pybeamformer.py:588-763)."""

    _config_cls = GSCLMSConfig

    def __init__(self, spec_sources, **kwargs):
        super().__init__(spec_sources, "SubbandGSCLMSBeamformer", **kwargs)

    @staticmethod
    def _make_step(cfg, wqH, BmH):
        return _lms_step_factory(cfg, wqH, BmH)

    @staticmethod
    def _make_state(cfg, F, B):
        return _LMSState(
            waH=jnp.zeros((F, B), jnp.complex64),
            subband_energy=jnp.full((F,), cfg.init_diagonal_load, jnp.float32),
            energy=jnp.asarray(cfg.init_diagonal_load, jnp.float32),
            gamma=jnp.asarray(cfg.gamma, jnp.float32),
            isamp=jnp.asarray(0, jnp.int32),
        )


class SubbandGSCRLSBeamformer(_AdaptiveGSCBase):
    """RLS GSC with quadratic constraint (pybeamformer.py:765-929)."""

    _config_cls = GSCRLSConfig

    def __init__(self, spec_sources, **kwargs):
        super().__init__(spec_sources, "SubbandGSCRLSBeamformer", **kwargs)

    @staticmethod
    def _make_step(cfg, wqH, BmH):
        return _rls_step_factory(cfg, wqH, BmH)

    @staticmethod
    def _make_state(cfg, F, B):
        return rls_init_state((), F, B, cfg.init_diagonal_load)
