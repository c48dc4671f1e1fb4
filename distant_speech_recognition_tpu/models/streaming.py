"""Chunked online (streaming) enhancement with explicit carried state.

The reference processes audio strictly online: every stage keeps O(1) state in
ring buffers (`RealBuffer_` modulated.h:56-140, GSC `wa`/`Pz` beamformer.h:
249-262, postfilter CSD recursions) and consumes one D-sample block at a time.
The batch pipeline in models/pipeline.py trades that latency for throughput.

This module restores the online capability TPU-natively: a *chunk* of blocks
is processed per call with all per-stage state carried explicitly as a JAX
pytree — so the chunk function jits once, the hot loop is still dense
vectorized math over the chunk (no per-frame Python), and the carried pytree
doubles as a **checkpoint**: serialize it (utils/checkpoint.py) and a new
process can resume the stream bit-exactly where the old one stopped.

Equivalence: feeding a signal through `StreamingEnhancer` in chunks of any
size yields exactly the same samples as `build_pipeline` on the whole
utterance (see tests/test_streaming.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filterbank import FilterbankParams, hermitian_mirror
from . import beamforming as bf
from .adaptive_gsc import (
    _LMSState,
    rls_init_state,
    _lms_step_factory,
    _rls_step_factory,
)
from .postfilter import SPECTRAL_FLOOR, _pair_mask

__all__ = [
    "AnalysisState",
    "SynthesisState",
    "streaming_analysis",
    "streaming_synthesis",
    "analysis_init",
    "synthesis_init",
    "StreamingEnhancer",
]


class AnalysisState(NamedTuple):
    """Sample history: the last ``N - D`` samples seen (zero at stream start),
    the dense equivalent of the analysis ring buffer (modulated.cc:363-373)."""

    hist: jax.Array  # [..., N - D]


class SynthesisState(NamedTuple):
    """The last ``(m-1) R`` DFT'd rows and ``R - 1`` polyphase-FIR rows —
    exactly the reach of the synthesis ring buffers (modulated.cc:594-606) —
    plus the push counter (priming pushes emit no FIR row, cc:574-578)."""

    c_hist: jax.Array  # [..., (m-1)*R, M]
    s_hist: jax.Array  # [..., R-1, M]
    count: jax.Array  # scalar int32: pushes seen so far


def analysis_init(params: FilterbankParams, lead: tuple = (), dtype=jnp.float32) -> AnalysisState:
    return AnalysisState(hist=jnp.zeros(lead + (params.N - params.D,), dtype))


def synthesis_init(params: FilterbankParams, lead: tuple = (), dtype=jnp.float32) -> SynthesisState:
    p = params
    return SynthesisState(
        c_hist=jnp.zeros(lead + ((p.m - 1) * p.R, p.M), dtype),
        s_hist=jnp.zeros(lead + (p.R - 1, p.M), dtype),
        count=jnp.asarray(0, jnp.int32),
    )


@partial(jax.jit, static_argnums=(3,))
def streaming_analysis(state: AnalysisState, x_chunk: jax.Array, h: jax.Array,
                       params: FilterbankParams):
    """Analysis of one chunk with carried sample history.

    ``x_chunk``: ``[..., n_blocks * D]`` samples.  Emits one subband frame per
    D-block: frame for push ``b`` is the window ending at the last sample of
    that block (OverSampledDFTAnalysisBank push semantics, modulated.cc:
    375-409).  Push index ``b`` equals batch-analysis frame ``b - laN``; the
    caller discards the first ``laN`` frames of the stream.

    Returns ``(new_state, frames [..., n_blocks, M] complex64)``.
    """
    D, N, M, m = params.D, params.N, params.M, params.m
    lead = x_chunk.ndim - 1
    xx = jnp.concatenate([state.hist, x_chunk], axis=-1)
    n_blocks = x_chunk.shape[-1] // D
    blocks = xx.reshape(xx.shape[:-1] + (-1, D))
    mR = m * params.R
    segs = [
        jax.lax.slice_in_dim(blocks, i, i + n_blocks, axis=lead) for i in range(mR)
    ]
    windows = jnp.stack(segs, axis=lead + 1).reshape(
        x_chunk.shape[:-1] + (n_blocks, N)
    )
    prod = windows[..., ::-1] * jnp.asarray(h, x_chunk.dtype)
    v = prod.reshape(prod.shape[:-1] + (m, M)).sum(axis=-2)
    X = jnp.fft.ifft(v, axis=-1) * M
    return AnalysisState(hist=xx[..., -(N - D):]), X.astype(jnp.complex64)


@partial(jax.jit, static_argnums=(3,))
def streaming_synthesis(state: SynthesisState, Y_chunk: jax.Array, g: jax.Array,
                        params: FilterbankParams):
    """Synthesis of one chunk of subband frames with carried filter state.

    ``Y_chunk``: ``[..., T, M]`` full-spectrum frames.  Emits one D-sample
    block per frame (the first ``synthesis_delay`` blocks of the stream are
    priming output and must be discarded by the caller, modulated.cc:574-578).

    Returns ``(new_state, samples [..., T * D])``.
    """
    M, m, R, D = params.M, params.m, params.R, params.D
    lead = Y_chunk.ndim - 2
    T = Y_chunk.shape[-2]

    c = jnp.real(jnp.fft.fft(Y_chunk, axis=-1)).astype(state.c_hist.dtype)
    call = jnp.concatenate([state.c_hist, c], axis=lead)  # [(m-1)R + T, M]
    gf = jnp.asarray(g, c.dtype).reshape(m, M)[:, ::-1]
    # s for push q = sum_k gf[k] * c[q - k R]; row (t + k R) of ``call`` is
    # global row (q - (m-1-k) R), so tap k pairs with gf[m-1-k]
    # (modulated.cc:594-598).
    s = sum(
        gf[m - 1 - k] * jax.lax.slice_in_dim(call, k * R, k * R + T, axis=lead)
        for k in range(m)
    )  # [..., T, M]
    # priming pushes produce no FIR row (modulated.cc:574-578)
    q = state.count + jnp.arange(T)
    s = jnp.where((q >= params.synthesis_delay)[:, None], s, 0.0)
    sall = jnp.concatenate([state.s_hist, s], axis=lead)  # [R-1+T, M]
    seg = sall.reshape(sall.shape[:-1] + (R, D))[..., ::-1]
    out = sum(
        jax.lax.slice_in_dim(seg, R - 1 - j, R - 1 - j + T, axis=lead)[..., R - 1 - j, :]
        for j in range(R)
    )  # [..., T, D]
    new = SynthesisState(
        c_hist=jax.lax.slice_in_dim(call, T, T + (m - 1) * R, axis=lead),
        s_hist=jax.lax.slice_in_dim(sall, T, T + R - 1, axis=lead),
        count=state.count + T,
    )
    return new, out.reshape(out.shape[:lead] + (T * D,))


class _CSDState(NamedTuple):
    phi: jax.Array  # [F, C, C]
    t: jax.Array  # scalar int32


def _zelinski_step_factory(wq_manifold, pf_alpha, pf_type, pf_min_frames):
    C = wq_manifold.shape[-1]
    pair = jnp.asarray(_pair_mask(C))
    real_mode = bool(pf_type & 0x01)

    def step(state: _CSDState, inputs):
        Xt, Y = inputs
        aligned = jnp.conj(wq_manifold) * Xt
        P = aligned[:, :, None] * jnp.conj(aligned)[:, None, :]
        phi = jnp.where(state.t > 0, pf_alpha * state.phi + (1.0 - pf_alpha) * P, P)
        csd_sum = jnp.sum(jnp.where(pair, phi, 0), axis=(-2, -1))
        num = jnp.maximum(jnp.real(csd_sum), 0.0) if real_mode else jnp.abs(csd_sum)
        den = jnp.sum(jnp.real(jnp.diagonal(phi, axis1=-2, axis2=-1)), axis=-1)
        ratio = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
        W = jnp.clip(ratio * (2.0 / (C - 1.0)), SPECTRAL_FLOOR, 1.0)
        out = jnp.where(state.t >= pf_min_frames, Y * W.astype(Y.dtype), Y)
        return _CSDState(phi=phi, t=state.t + 1), out

    return step


class StreamingEnhancer:
    """Online chunked version of ``build_pipeline``: same config surface,
    same output samples, O(1) carried state, checkpoint/resume.

    Supported: beamformer ds | sd_mvdr | gsc_lms | gsc_rls, postfilter
    none | zelinski.  Feed samples with :meth:`process` (any length), finish
    with :meth:`flush`; both return the enhanced samples ready so far.
    :meth:`checkpoint` / :meth:`restore` snapshot the full pipeline state.
    """

    def __init__(self, cfg, mpos, delays, h, g, frames_per_chunk: int = 64):
        from .pipeline import PipelineConfig  # noqa: F401  (type reference)

        if cfg.postfilter not in ("none", "zelinski"):
            raise ValueError(f"streaming supports none|zelinski, got {cfg.postfilter}")
        if cfg.beamformer not in ("ds", "sd_mvdr", "gsc_lms", "gsc_rls"):
            raise ValueError(f"unsupported streaming beamformer {cfg.beamformer}")
        self.cfg = cfg
        self.p = cfg.fb
        self.h = np.asarray(h, np.float32)
        self.g = np.asarray(g, np.float32)
        self.Tc = int(frames_per_chunk)
        delays = np.asarray(delays)

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            vs = bf.array_manifold(cfg.fb.M, cfg.samplerate, delays)
            # = the C++ ta_ (beamformer.cc:960-965); _zelinski_step_factory
            # conjugates it per channel like time_alignment_
            # (postfilter.cc:30-43)
            self.wq_manifold = np.asarray(vs)
            if cfg.beamformer == "ds":
                self.wqH, self.BmH = np.conj(self.wq_manifold), None
            elif cfg.beamformer == "sd_mvdr":
                self.wqH = np.asarray(
                    bf.superdirective_weights(mpos, delays, cfg.fb.M, cfg.samplerate, mu=cfg.sd_mu)
                )
                self.BmH = None
            else:
                from .adaptive_gsc import gsc_weights

                wqH, BmH = gsc_weights(cfg.fb.M, cfg.samplerate, delays, cfg.Nc)
                self.wqH, self.BmH = np.asarray(wqH), np.asarray(BmH)

        F = cfg.fb.M // 2 + 1
        C = len(delays)
        self._F, self._C = F, C

        # --- carried state ---------------------------------------------
        self.a_state = analysis_init(self.p, lead=(C,))
        self.s_state = synthesis_init(self.p)
        if cfg.beamformer == "gsc_lms":
            c = cfg.lms
            B = self.BmH.shape[1]
            self.g_state = _LMSState(
                waH=jnp.zeros((F, B), jnp.complex64),
                subband_energy=jnp.full((F,), c.init_diagonal_load, jnp.float32),
                energy=jnp.asarray(c.init_diagonal_load, jnp.float32),
                gamma=jnp.asarray(c.gamma, jnp.float32),
                isamp=jnp.asarray(0, jnp.int32),
            )
        elif cfg.beamformer == "gsc_rls":
            c = cfg.rls
            B = self.BmH.shape[1]
            self.g_state = rls_init_state((), F, B, c.init_diagonal_load)
        else:
            self.g_state = None
        self.pf_state = (
            _CSDState(phi=jnp.zeros((F, C, C), jnp.complex64), t=jnp.asarray(0, jnp.int32))
            if cfg.postfilter == "zelinski"
            else None
        )

        # --- host-side stream bookkeeping ------------------------------
        self._sample_buf = np.zeros((C, 0), np.float32)
        self._frame_buf = None  # np [C, n, M] pending subband frames
        self._skip_frames = self.p.laN  # frames still to discard at start
        self._skip_blocks = self.p.synthesis_delay  # priming output blocks
        self._flushed = False

        self._mid = self._build_mid()

    # ------------------------------------------------------------------
    def _build_mid(self):
        cfg = self.cfg
        wqH = jnp.asarray(self.wqH)
        BmH = None if self.BmH is None else jnp.asarray(self.BmH)
        wq_manifold = jnp.asarray(self.wq_manifold)
        M = self.p.M
        pf_step = (
            _zelinski_step_factory(wq_manifold, cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames)
            if cfg.postfilter == "zelinski"
            else None
        )
        if cfg.beamformer in ("gsc_lms", "gsc_rls"):
            gsc_step = (
                _lms_step_factory(cfg.lms, wqH, BmH)
                if cfg.beamformer == "gsc_lms"
                else _rls_step_factory(cfg.rls, wqH, BmH)
            )

            def mid(g_state, pf_state, s_state, frames):
                # frames: [C, T, M] -> Y blocks [T * D]
                X = bf.snapshots(frames)  # [T, F, C]
                energy = bf.frame_energy(frames[0]).astype(jnp.float32)

                def step(carry, inputs):
                    gs, ps = carry
                    Xt, et = inputs
                    gs, Y = gsc_step(gs, (Xt, et))
                    if pf_step is not None:
                        ps, Y = pf_step(ps, (Xt, Y))
                    return (gs, ps), Y

                (g_state, pf_state), Y = jax.lax.scan(step, (g_state, pf_state), (X, energy))
                Yfull = hermitian_mirror(Y, M)
                s_state, y = streaming_synthesis(s_state, Yfull, self.g, self.p)
                return g_state, pf_state, s_state, y
        else:

            def mid(g_state, pf_state, s_state, frames):
                X = bf.snapshots(frames)
                Y = bf.apply_weights(wqH, X)
                if pf_step is not None:
                    def step(ps, inputs):
                        ps, out = pf_step(ps, inputs)
                        return ps, out

                    pf_state, Y = jax.lax.scan(step, pf_state, (X, Y))
                Yfull = hermitian_mirror(Y, M)
                s_state, y = streaming_synthesis(s_state, Yfull, self.g, self.p)
                return g_state, pf_state, s_state, y

        return jax.jit(mid)

    # ------------------------------------------------------------------
    def _run_frames(self, force: bool = False) -> np.ndarray:
        """Run pending frames through the adaptive + synthesis stages in
        fixed-size chunks; with ``force``, zero-pad the final partial chunk
        and keep only the samples from real frames."""
        D = self.p.D
        outs = []
        valid = 0
        while self._frame_buf is not None and self._frame_buf.shape[1] >= self.Tc:
            chunk = jnp.asarray(self._frame_buf[:, : self.Tc])
            self._frame_buf = self._frame_buf[:, self.Tc :]
            self.g_state, self.pf_state, self.s_state, y = self._mid(
                self.g_state, self.pf_state, self.s_state, chunk
            )
            outs.append(np.asarray(y))
            valid += self.Tc * D
        n_left = 0 if self._frame_buf is None else self._frame_buf.shape[1]
        if force and n_left:
            pad = np.zeros((self._C, self.Tc - n_left, self.p.M), np.complex64)
            chunk = jnp.asarray(np.concatenate([self._frame_buf, pad], axis=1))
            self._frame_buf = None
            self.g_state, self.pf_state, self.s_state, y = self._mid(
                self.g_state, self.pf_state, self.s_state, chunk
            )
            outs.append(np.asarray(y))
            valid += n_left * D
        if not outs:
            return np.zeros(0, np.float32)
        y = np.concatenate(outs)[:valid]
        skip = min(self._skip_blocks * D, valid)
        self._skip_blocks -= skip // D
        return y[skip:]

    def process(self, x: np.ndarray) -> np.ndarray:
        """Feed ``x [C, T]`` samples; returns enhanced samples available."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        x = np.asarray(x, np.float32)
        self._sample_buf = np.concatenate([self._sample_buf, x], axis=1)
        D = self.p.D
        n_blocks = self._sample_buf.shape[1] // D
        if n_blocks:
            chunk = self._sample_buf[:, : n_blocks * D]
            self._sample_buf = self._sample_buf[:, n_blocks * D :]
            self.a_state, frames = streaming_analysis(self.a_state, jnp.asarray(chunk), self.h, self.p)
            frames = np.asarray(frames)
            if self._skip_frames:
                k = min(self._skip_frames, frames.shape[1])
                frames = frames[:, k:]
                self._skip_frames -= k
            if frames.shape[1]:
                self._frame_buf = (
                    frames
                    if self._frame_buf is None
                    else np.concatenate([self._frame_buf, frames], axis=1)
                )
        return self._run_frames()

    def flush(self) -> np.ndarray:
        """End of stream: zero-pad the residual to a whole block, push the
        analysis bank's ``analysis_delay`` flush blocks (modulated.cc:440-466),
        drain all pending frames, and return the tail samples."""
        if self._flushed:
            return np.zeros(0, np.float32)
        D = self.p.D
        resid = self._sample_buf.shape[1]
        pad = (D - resid % D) % D + self.p.analysis_delay * D
        out = self.process(np.zeros((self._C, pad), np.float32))
        self._flushed = True
        tail = self._run_frames(force=True)
        return np.concatenate([out, tail])

    # ------------------------------------------------------------------
    def checkpoint(self) -> dict:
        """Snapshot of all carried state + host bookkeeping (a pytree of
        numpy arrays; serialize with utils/checkpoint.save_pytree)."""
        dev = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
        return {
            "a_state": dev(self.a_state),
            "s_state": dev(self.s_state),
            "g_state": dev(self.g_state) if self.g_state is not None else None,
            "pf_state": dev(self.pf_state) if self.pf_state is not None else None,
            "sample_buf": self._sample_buf,
            "frame_buf": self._frame_buf,
            "skip_frames": self._skip_frames,
            "skip_blocks": self._skip_blocks,
        }

    def restore(self, snap: dict) -> None:
        self.a_state = AnalysisState(*map(jnp.asarray, snap["a_state"]))
        self.s_state = SynthesisState(*map(jnp.asarray, snap["s_state"]))
        if snap["g_state"] is not None:
            cls = type(self.g_state)
            self.g_state = cls(*map(jnp.asarray, snap["g_state"]))
        if snap["pf_state"] is not None:
            self.pf_state = _CSDState(*map(jnp.asarray, snap["pf_state"]))
        self._sample_buf = np.asarray(snap["sample_buf"])
        fb = snap["frame_buf"]
        self._frame_buf = None if fb is None else np.asarray(fb)
        self._skip_frames = int(snap["skip_frames"])
        self._skip_blocks = int(snap["skip_blocks"])
        self._flushed = False
