"""LTI filtering of streams and the frequency-domain block-LMS filter.

Batched equivalents of convolution/convolution.cc (OverlapAdd / OverlapSave
FFT-domain FIR filtering of frame streams) and lms/lms.cc
(FastBlockLMSFeature — Haykin's fast block LMS).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["overlap_add_filter", "overlap_save_filter", "fast_block_lms"]


def overlap_add_filter(x: jax.Array, impulse_response: jax.Array, fftlen: int | None = None) -> jax.Array:
    """FIR-filter a whole signal with the overlap-add method
    (OverlapAdd, convolution/convolution.h:25-52).

    ``x``: [..., T]; ``impulse_response``: [L].  Returns [..., T + L - 1].
    """
    h = jnp.asarray(impulse_response, x.dtype)
    L = h.shape[0]
    if fftlen is None:
        fftlen = 1
        while fftlen < 4 * L:
            fftlen *= 2
    block = fftlen - L + 1
    T = x.shape[-1]
    n_blocks = -(-T // block)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n_blocks * block - T)]
    xb = jnp.pad(x, pad).reshape(x.shape[:-1] + (n_blocks, block))
    H = jnp.fft.rfft(h, n=fftlen)
    Y = jnp.fft.irfft(jnp.fft.rfft(xb, n=fftlen, axis=-1) * H, n=fftlen, axis=-1)
    out_len = n_blocks * block + L - 1
    # overlap-add the length-fftlen block outputs at stride `block`: pad the
    # block results to a whole number of width-`block` segments so block j's
    # segment i lands exactly at (i + j) * block.
    n_seg = -(-fftlen // block)
    Yp = jnp.pad(Y, [(0, 0)] * (Y.ndim - 1) + [(0, n_seg * block - fftlen)])
    out = jnp.zeros(x.shape[:-1] + (out_len + n_seg * block,), x.dtype)
    for i in range(n_seg):
        seg = Yp[..., i * block : (i + 1) * block]
        flat = seg.reshape(seg.shape[:-2] + (-1,))
        out = out.at[..., i * block : i * block + flat.shape[-1]].add(flat)
    return out[..., : T + L - 1]


def overlap_save_filter(x: jax.Array, impulse_response: jax.Array, fftlen: int | None = None) -> jax.Array:
    """FIR-filter with the overlap-save method (OverlapSave,
    convolution/convolution.h:55-84).  Returns the same-length filtered
    signal [..., T] (steady-state linear convolution)."""
    h = jnp.asarray(impulse_response, x.dtype)
    L = h.shape[0]
    if fftlen is None:
        fftlen = 1
        while fftlen < 4 * L:
            fftlen *= 2
    hop = fftlen - (L - 1)
    T = x.shape[-1]
    n_blocks = -(-T // hop)
    pad = [(0, 0)] * (x.ndim - 1) + [(L - 1, n_blocks * hop - T)]
    xp = jnp.pad(x, pad)
    segs = [
        jax.lax.slice_in_dim(xp, i * hop, i * hop + fftlen, axis=x.ndim - 1)
        for i in range(n_blocks)
    ]
    xb = jnp.stack(segs, axis=-2)  # [..., n_blocks, fftlen]
    H = jnp.fft.rfft(h, n=fftlen)
    Y = jnp.fft.irfft(jnp.fft.rfft(xb, axis=-1) * H, n=fftlen, axis=-1)
    valid = Y[..., L - 1 :]  # discard the circularly-corrupted head
    out = valid.reshape(valid.shape[:-2] + (-1,))
    return out[..., :T]


@partial(jax.jit, static_argnums=(2,))
def fast_block_lms(
    desired: jax.Array,
    x: jax.Array,
    block_len: int,
    alpha: float = 0.01,
    gamma: float = 0.9,
):
    """Frequency-domain block-LMS adaptive filter
    (FastBlockLMSFeature, lms/lms.cc): per block of N samples, filter with
    an M=N-tap FIR via overlap-save (FFT size 2N), power-normalize the
    step per bin with a recursive PSD estimate, and update the weights with
    the gradient-constraint (zero the tail half in time).

    ``desired``/``x``: [T].  Returns (error signal [T'], final weights W [2N]
    in the frequency domain).
    """
    N = block_len
    T = (desired.shape[-1] // N) * N
    d = desired[:T].reshape(-1, N)
    u = x[: T].reshape(-1, N)
    n_blocks = d.shape[0]

    def step(carry, inputs):
        W, U_prev, D = carry  # W: [2N] freq weights, U_prev: last block, D: PSD
        d_b, u_b = inputs
        u2 = jnp.concatenate([U_prev, u_b])  # overlap-save input [2N]
        U = jnp.fft.fft(u2)
        y = jnp.real(jnp.fft.ifft(W * U))[N:]  # valid half
        e = d_b - y
        E = jnp.fft.fft(jnp.concatenate([jnp.zeros(N), e]))
        D_new = gamma * D + (1.0 - gamma) * jnp.abs(U) ** 2
        phi = jnp.fft.ifft(jnp.conj(U) * E / jnp.maximum(D_new, 1e-10))
        phi = jnp.concatenate([jnp.real(phi[:N]), jnp.zeros(N)])  # gradient constraint
        W_new = W + alpha * jnp.fft.fft(phi)
        return (W_new, u_b, D_new), e

    W0 = jnp.zeros(2 * N, jnp.complex64)
    D0 = jnp.full(2 * N, 1e-2, jnp.float32)
    (W, _, _), err = jax.lax.scan(step, (W0, jnp.zeros(N, x.dtype), D0), (d, u))
    return err.reshape(-1), W
