"""Pallas TPU kernels for the filterbank hot path.

The analysis bank's polyphase stage is, per output frame, an m-tap FIR over
pushed (reversed) sample windows with stride R (modulated.cc:384-391):

    v[t, mi] = sum_k h[mi + M k] * S[t + (m-1-k) R, mi]

The kernel receives the m tap-aligned views of the reversed-window stream
(shifted in XLA — cheap slices of the same buffer) and accumulates all taps
in VMEM registers, writing each [T_tile, M] output block once.  Tiling obeys
the TPU (8, 128) block constraints: T_tile is a multiple of 8 and M must be
a multiple of 128 (fall back to the XLA path otherwise).

Exact float32 math; validated in interpreter mode against the XLA path.
NOTE: the experimental axon TPU backend in this image rejects ALL custom
Mosaic kernels at runtime (UNIMPLEMENTED) — on standard TPU runtimes the
kernel compiles and runs; here it remains available via interpret=True and
the flag stays off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

PALLAS_ANALYSIS = False  # opt-in for analysis_pallas default usage

__all__ = ["polyphase_fir", "reversed_window_stream", "PALLAS_ANALYSIS"]


def _make_kernel(m: int, T_tile: int):
    def kernel(*refs):
        h_ref = refs[m]
        v_ref = refs[m + 1]
        acc = h_ref[0, 0, :][None, :] * refs[0][:, :]
        for k in range(1, m):
            acc = acc + h_ref[k, 0, :][None, :] * refs[k][:, :]
        v_ref[:, :] = acc

    return kernel


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def polyphase_fir(
    S: jax.Array,
    h_folded: jax.Array,
    m: int,
    R: int,
    T_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Strided m-tap FIR over rows: ``v[t] = sum_k h[k] * S[t + (m-1-k) R]``.

    ``S``: [T + (m-1)R, M] (history-padded); ``h_folded``: [m, M] with
    ``h_folded[k, mi] = h[mi + M k]``.  Returns v [T, M].
    """
    from jax.experimental import pallas as pl

    hist = (m - 1) * R
    T = S.shape[0] - hist
    M = S.shape[1]
    n_tiles = -(-T // T_tile)
    T_pad = n_tiles * T_tile
    # tap-aligned views, each padded to T_pad rows
    taps = []
    for k in range(m):
        start = (m - 1 - k) * R
        v = jax.lax.slice_in_dim(S, start, start + T, axis=0)
        taps.append(jnp.pad(v, ((0, T_pad - T), (0, 0))))

    h3 = jnp.asarray(h_folded, S.dtype).reshape(m, 1, M)

    out = pl.pallas_call(
        _make_kernel(m, T_tile),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((T_tile, M), lambda i: (i, 0)) for _ in range(m)]
        + [pl.BlockSpec((m, 1, M), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((T_tile, M), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T_pad, M), S.dtype),
        interpret=interpret,
    )(*taps, h3)
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
