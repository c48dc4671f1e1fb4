"""Perfect-reconstruction cosine-modulated FFT filterbank.

Batch reformulation of the reference's PR banks
(PerfectReconstructionFFTAnalysisBank / ...SynthesisBank,
modulated/modulated.cc:634-904): ``2M`` bands, prototype length ``2M*m``,
alternating-sign polyphase with push stride ``r+2``, ``w_k = e^{-j pi k/(2M)}``
phase factors, and *normalized* inverse FFT (the reference divides the FFTW
output by 2M, modulated.cc:707-709).

Derivation (same ring-buffer algebra as ops/filterbank.py): at output frame
``t`` the analysis band ``b`` is::

    v_t[b] = w_b * sum_k (-1)^k h[b + 2M k] * x[(t - (r+2) k + 1) D - 1 - b]
    X_t    = ifft_{2M}(v_t)                  (normalized)

and the synthesis mirrors it with flipped polyphase order, conjugate phase
factors, 2R-segment overlap-add and a 1/R output scale
(modulated.cc:861-898).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PRFilterbankParams", "pr_analysis", "pr_synthesis"]


@dataclasses.dataclass(frozen=True)
class PRFilterbankParams:
    """M, m, r conventions of PerfectReconstructionFilterBank
    (modulated.cc:284-300): bands = 2M, N = 2M*m, D = M/2^r,
    processing_delay = 2m - 1."""

    M: int = 64
    m: int = 2
    r: int = 0

    @property
    def R(self) -> int:
        return 1 << self.r

    @property
    def D(self) -> int:
        return self.M // self.R

    @property
    def bands(self) -> int:
        return 2 * self.M

    @property
    def N(self) -> int:
        return 2 * self.M * self.m

    @property
    def processing_delay(self) -> int:
        return 2 * self.m - 1

    @property
    def stride(self) -> int:  # polyphase push stride (modulated.cc:695)
        return self.r + 2


def _phase_factors(M2: int, sign: float) -> np.ndarray:
    """w_k = e^{sign * j pi k / (2M)} (modulated.cc:646-652, 774-781)."""
    return np.exp(sign * 1j * np.pi * np.arange(M2) / M2)


def num_pr_analysis_frames(params: PRFilterbankParams, num_samples: int) -> int:
    n_blocks = -(-num_samples // params.D)
    return n_blocks + params.processing_delay


def pr_analysis(x: jax.Array, h: jax.Array, params: PRFilterbankParams) -> jax.Array:
    """PR analysis over a whole utterance: ``x [..., T]`` ->
    complex ``[..., n_frames, 2M]``."""
    p = params
    D, M2, m, s = p.D, p.bands, p.m, p.stride
    h = jnp.asarray(h)
    if h.shape != (p.N,):
        raise ValueError(f"prototype must have length 2*M*m={p.N}, got {h.shape}")
    lead = x.ndim - 1
    T = x.shape[-1]
    n_blocks = -(-T // D)
    n_frames = n_blocks + p.processing_delay
    R2 = M2 // D  # = 2R blocks per window

    # zero-history stream + end padding (update_buffer_, modulated.cc:727-756);
    # all lags are whole D-blocks: lag k reaches k*s blocks back.
    front = (m - 1) * s + R2 - 1
    tail = p.processing_delay
    xb = jnp.pad(x, [(0, 0)] * lead + [(0, n_blocks * D - T)])
    xb = jnp.pad(xb, [(0, 0)] * lead + [(front * D, tail * D)])
    blocks = xb.reshape(xb.shape[:-1] + (-1, D))

    def lagged(k):
        """Reversed M2-sample window ending at push t - s*k, for all frames t:
        value[b] = x[(t - s k + 1) D - 1 - b].  [..., n_frames, M2]."""
        start = front - k * s - R2 + 1
        segs = [
            jax.lax.slice_in_dim(blocks, start + i, start + i + n_frames, axis=lead)
            for i in range(R2)
        ]
        win = jnp.stack(segs, axis=lead + 1)  # [..., n_frames, R2, D]
        win = win.reshape(win.shape[:lead] + (n_frames, M2))
        return win[..., ::-1]

    hmat = h.reshape(m, M2)  # h[b + 2M k] = hmat[k, b]
    flips = jnp.asarray([(-1.0) ** k for k in range(m)])
    v = sum(
        flips[k] * hmat[k] * lagged(k)
        for k in range(m)
    )  # [..., n_frames, M2]
    w = jnp.asarray(_phase_factors(M2, -1.0), jnp.complex64)
    return jnp.fft.ifft(v.astype(jnp.complex64) * w, axis=-1)


def pr_synthesis(Y: jax.Array, g: jax.Array, params: PRFilterbankParams) -> jax.Array:
    """PR synthesis: ``Y [..., T_in, 2M]`` -> samples
    ``[..., (T_in - 2m + 1) * D]`` (modulated.cc:861-898)."""
    p = params
    D, M2, m, s, R = p.D, p.bands, p.m, p.stride, p.R
    g = jnp.asarray(g)
    if g.shape != (p.N,):
        raise ValueError(f"prototype must have length 2*M*m={p.N}, got {g.shape}")
    pd = p.processing_delay
    T_in = Y.shape[-2]
    T_out = T_in - pd
    if T_out <= 0:
        raise ValueError(f"need more than {pd} subband frames, got {T_in}")
    lead = Y.ndim - 2

    # forward unnormalized FFT, apply conjugate phase factors, take real
    w = jnp.asarray(_phase_factors(M2, +1.0), jnp.complex64)
    c = jnp.real(jnp.fft.fft(Y, axis=-1) * w)  # [..., T_in, M2]

    # polyphase: sout_t[b] = sum_k flip_k(m) g[b + 2M(m-1-k)] c_{t' - s k}[b]
    # with flip starting at +1 if m odd else -1, alternating (modulated.cc:879-887)
    gmat = jnp.asarray(g, c.dtype).reshape(m, M2)
    start_flip = 1.0 if (m % 2 == 1) else -1.0
    hist = (m - 1) * s
    cfg = [(0, 0)] * lead + [(hist, 0), (0, 0)]
    cp = jnp.pad(c, cfg)
    sout = sum(
        (start_flip * (-1.0) ** k)
        * gmat[m - 1 - k]
        * jax.lax.slice_in_dim(cp, pd + hist - s * k, pd + hist - s * k + T_out, axis=lead)
        for k in range(m)
    )  # [..., T_out, M2]

    # overlap-add of 2R reversed segments with 1/R scale:
    # out_t[i] = sum_{j=0}^{2R-1} sout_{t-j}[(2R-1-j) D + (D-1-i)] / R
    R2 = 2 * R
    cfg = [(0, 0)] * lead + [(R2 - 1, 0), (0, 0)]
    sp = jnp.pad(sout, cfg)
    seg = sp.reshape(sp.shape[:-1] + (R2, D))[..., ::-1]
    out = sum(
        jax.lax.slice_in_dim(seg, R2 - 1 - j, R2 - 1 - j + T_out, axis=lead)[..., R2 - 1 - j, :]
        for j in range(R2)
    ) / R
    return out.reshape(out.shape[:lead] + (T_out * D,))
