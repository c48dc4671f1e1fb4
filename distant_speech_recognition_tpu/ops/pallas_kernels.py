"""Pallas TPU kernels for the filterbank hot path.

The analysis bank's polyphase stage is, per output frame, an m-tap FIR over
pushed (reversed) sample windows with stride R (modulated.cc:384-391):

    v[t, mi] = sum_k h[mi + M k] * S[t - R k, mi]

where ``S[t', i] = x[(t'+1) D - 1 - i]`` is the reversed-window stream.  The
XLA path materializes the m shifted operands; this kernel streams one VMEM
slab per frame tile and accumulates the m taps in registers, reading S once.

The kernel is exact (same float32 ops) and validated against the XLA path;
`analysis` uses it when `PALLAS_ANALYSIS` is enabled (off by default — the
axon backend in this image is fragile with custom kernels; flip it on for
standard TPU runtimes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

PALLAS_ANALYSIS = False  # opt-in

__all__ = ["polyphase_fir", "PALLAS_ANALYSIS"]


def _polyphase_kernel(m: int, R: int, T_tile: int):
    def kernel(s_ref, h_ref, v_ref):
        # s_ref: [T_tile + (m-1)R, M] slab; h_ref: [m, M]; v_ref: [T_tile, M]
        hist = (m - 1) * R
        acc = h_ref[m - 1, :][None, :] * s_ref[0:T_tile, :]
        for k in range(m - 2, -1, -1):
            off = hist - k * R
            acc = acc + h_ref[k, :][None, :] * s_ref[off : off + T_tile, :]
        v_ref[:, :] = acc

    return kernel


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def polyphase_fir(
    S: jax.Array,
    h_folded: jax.Array,
    m: int,
    R: int,
    T_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Strided m-tap FIR over rows: ``v[t] = sum_k h[k] * S[t + (m-1-k) R]``.

    ``S``: [T + (m-1)R, M] (already history-padded); ``h_folded``: [m, M]
    with ``h_folded[k, mi] = h[mi + M k]``.  Returns v [T, M].
    """
    from jax.experimental import pallas as pl

    hist = (m - 1) * R
    T = S.shape[0] - hist
    M = S.shape[1]
    n_tiles = -(-T // T_tile)
    pad = n_tiles * T_tile - T
    if pad:
        S = jnp.pad(S, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        _polyphase_kernel(m, R, T_tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T_tile + hist, M), lambda i: (i, 0)),
            pl.BlockSpec((m, M), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T_tile, M), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * T_tile, M), S.dtype),
        interpret=interpret,
    )(S, jnp.asarray(h_folded, S.dtype))
    return out[:T]


def reversed_window_stream(x_blocks: jax.Array, M: int, R: int) -> jax.Array:
    """Build ``S[t', i] = x[(t'+1) D - 1 - i]`` from D-blocks:
    concatenate the R most recent blocks per push and reverse.

    ``x_blocks``: [n_blocks(+history), D] -> S [n_pushes, M].
    """
    D = x_blocks.shape[-1]
    n = x_blocks.shape[0] - (R - 1)
    segs = [
        jax.lax.slice_in_dim(x_blocks, R - 1 - j, R - 1 - j + n, axis=0)
        for j in range(R)
    ]
    win = jnp.stack(segs[::-1], axis=1).reshape(n, R * D)  # chronological
    return win[:, ::-1]
