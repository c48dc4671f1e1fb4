"""Pallas TPU kernels for the filterbank hot path.

Two generations live here:

1. `analysis_tm_fused` / `synthesis_tm_fused` — the production kernels used
   by the flagship time-major pipeline (models/pipeline.py).  Each fuses the
   whole filterbank stage into one kernel: polyphase FIR accumulating in
   VMEM registers + packed DFT matmul on the MXU (+ overlap-add for
   synthesis), so the intermediate FIR/DFT tensors of the XLA path never
   touch HBM.  Halo frame windows are expressed with Element-indexed
   BlockSpecs (all dims Element, physically padded in one XLA pass).
   Measured on v5e (axon): analysis ~1.6x the XLA stage, synthesis ~2x.
   DMA note: the batch tile must be large (>=128 rows) so each DMA run is
   a contiguous 128-256KB row — small batch tiles scatter 512B runs and
   lose 3x.  A batch-major-input variant (which would skip the XLA
   transpose pass) was tried and abandoned: per-frame-row dots / middle-dim
   slicing sends the Mosaic compiler into a >5-minute pathological compile
   on this toolchain, and an in-kernel relayout would pay back most of the
   transpose it saves.

2. `polyphase_fir` + `reversed_window_stream` — the earlier FIR-only kernel
   (kept for reference/tests); XLA's fused slice-sum matched it, so it is
   opt-in via `analysis_pallas`.

The analysis polyphase stage is, per output frame, an m-tap FIR over pushed
(reversed) sample windows with stride R (modulated.cc:384-391):

    v[t, mi] = sum_k h[mi + M k] * S[t + (m-1-k) R, mi]

Exact float32 math; every kernel is validated in interpreter mode against
the XLA path (tests/test_pallas_fused.py) and on-chip at bench shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PALLAS_ANALYSIS = False  # opt-in for analysis_pallas default usage

__all__ = [
    "polyphase_fir",
    "reversed_window_stream",
    "analysis_tm_fused",
    "synthesis_tm_fused",
    "PALLAS_ANALYSIS",
]



def _parallel_grid():
    """Both grid dims of the filterbank kernels are embarrassingly parallel
    (tiles share no state); telling Mosaic so improves its pipelining
    (~3% on the analysis stage, measured on v5e).  The VMEM limit is raised
    from the 16 MiB scoped default to 96 MiB (of the v5e's 128 MiB) so the
    frame tile can grow past 8 — the kernels are grid-launch bound at small
    tiles, and bigger tiles amortize the halo re-reads."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=96 * 1024 * 1024,
    )


def _kernel_prec():
    """Dot precision for in-kernel MXU ops.  Mosaic supports only DEFAULT and
    HIGHEST; map the XLA-side HIGH default (ops.dft._PREC) to HIGHEST — the
    fused kernels are DMA-bound, so the extra bf16 passes are free."""
    from jax import lax
    from . import dft

    return lax.Precision.HIGHEST if dft._PREC == lax.Precision.HIGH else dft._PREC


def _make_analysis_tm_kernel(m: int, R: int, Tt: int, D: int, prec):
    """Fused polyphase-FIR + DFT-matmul kernel body.

    Refs: blocks [Tt + m*R - 1, Bb, D] (halo window of D-sample blocks,
    time-major), hw [m*R, D] (per-parity prototype rows), A [M, Mout]
    (packed analysis DFT matrix), out [Tt, Bb, Mout].

    Per block-parity j (modulated.cc:384-391 algebra, see
    `ops.filterbank._analysis_matmul_real`): the m taps accumulate in VMEM
    registers — the ``w_j`` FIR tensor never exists in HBM — and feed the
    MXU against rows ``j*D:(j+1)*D`` of the DFT matrix.
    """

    def kernel(blocks_ref, hw_ref, A_ref, out_ref):
        Bb = out_ref.shape[1]
        Mout = out_ref.shape[2]
        acc = None
        for j in range(R):
            w = None
            for k in range(m):
                off = (m - 1 - k) * R + j
                t = hw_ref[j * m + k, :][None, None, :] * blocks_ref[off : off + Tt]
                w = t if w is None else w + t
            term = jax.lax.dot_general(
                w.reshape(Tt * Bb, D),
                A_ref[j * D : (j + 1) * D, :],
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
        out_ref[:] = acc.reshape(Tt, Bb, Mout)

    return kernel


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _analysis_tm_fused_call(
    blocks_tm: jax.Array,
    hw: jax.Array,
    A: jax.Array,
    laN: int,
    n_frames: int,
    Tt: int,
    Bb: int,
    interpret: bool,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from . import dft

    n_blocks, BC, D = blocks_tm.shape
    mR_m1 = hw.shape[0] - 1  # m*R - 1 halo
    m_times_R = hw.shape[0]
    # infer (m, R) from hw layout [R groups of m rows] via D and A
    Mout = A.shape[1]
    M = A.shape[0]
    R = M // D
    m = m_times_R // R
    n_t = -(-n_frames // Tt)
    n_b = -(-BC // Bb)
    # Mosaic requires every dim of an Element-indexed spec to be Element, so
    # all starts must be physically in bounds: pad the halo tail on the time
    # axis and the batch axis up to a whole number of tiles (no-ops at the
    # benchmark shapes).
    need_t = laN + n_t * Tt + m * R - 1
    need_b = n_b * Bb
    if need_t > n_blocks or need_b > BC:
        blocks_tm = jnp.pad(
            blocks_tm,
            ((0, max(need_t - n_blocks, 0)), (0, max(need_b - BC, 0)), (0, 0)),
        )

    kernel = _make_analysis_tm_kernel(m, R, Tt, D, _kernel_prec())
    return pl.pallas_call(
        kernel,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(Tt + m * R - 1), pl.Element(Bb), pl.Element(D)),
                lambda b, t: (laN + t * Tt, b * Bb, 0),
            ),
            pl.BlockSpec((m * R, D), lambda b, t: (0, 0)),
            pl.BlockSpec((M, Mout), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, Bb, Mout), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((n_frames, BC, Mout), jnp.float32),
        interpret=interpret,
        compiler_params=_parallel_grid(),
    )(blocks_tm, hw, A)


def _make_analysis_tm_blocked_kernel(m: int, R: int, Tt: int, D: int, prec):
    """Analysis kernel body over TWO adjacent block-indexed tiles: the halo
    window [t*Tt, t*Tt + Tt + m*R - 1) is stitched from block t and the
    first m*R-1 rows of block t+1 in VMEM.  Unlike the Element-indexed
    variants, standard block indexing lets Mosaic double-buffer the DMAs."""

    def kernel(a_ref, b_ref, hw_ref, A_ref, out_ref):
        Bb = out_ref.shape[1]
        Mout = out_ref.shape[2]
        win = jnp.concatenate([a_ref[:], b_ref[: m * R - 1]], axis=0)
        acc = None
        for j in range(R):
            w = None
            for k in range(m):
                off = (m - 1 - k) * R + j
                t = hw_ref[j * m + k, :][None, None, :] * win[off : off + Tt]
                w = t if w is None else w + t
            term = jax.lax.dot_general(
                w.reshape(Tt * Bb, D),
                A_ref[j * D : (j + 1) * D, :],
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
        out_ref[:] = acc.reshape(Tt, Bb, Mout)

    return kernel


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _analysis_tm_blocked_call(
    blocks_tm: jax.Array,
    hw: jax.Array,
    A: jax.Array,
    n_frames: int,
    Tt: int,
    Bb: int,
    interpret: bool,
    mR: int = 0,
) -> jax.Array:
    """Block-indexed analysis call.  Caller guarantees the halo alignment
    ``laN == m*R - 1`` (delay-compensation type 2), ``Tt >= m*R - 1``, and a
    blocks array padded to ``(n_t + 1) * Tt`` rows and whole batch tiles —
    the window for frame tile t then starts exactly at block row t*Tt, so
    each grid step reads blocks t and t+1 of the SAME array as two standard
    block-indexed inputs (pipelinable), no Element indexing needed."""
    from jax.experimental import pallas as pl

    n_blocks, BC, D = blocks_tm.shape
    Mout = A.shape[1]
    M = A.shape[0]
    R = M // D
    m = (mR if mR else hw.shape[0]) // R
    n_t = -(-n_frames // Tt)
    n_b = BC // Bb

    kernel = _make_analysis_tm_blocked_kernel(m, R, Tt, D, _kernel_prec())
    return pl.pallas_call(
        kernel,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec((Tt, Bb, D), lambda b, t: (t, b, 0)),
            pl.BlockSpec((Tt, Bb, D), lambda b, t: (t + 1, b, 0)),
            pl.BlockSpec((m * R, D), lambda b, t: (0, 0)),
            pl.BlockSpec((M, Mout), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, Bb, Mout), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t * Tt, BC, Mout), jnp.float32),
        interpret=interpret,
        compiler_params=_parallel_grid(),
    )(blocks_tm, blocks_tm, hw, A)[:n_frames]


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def _analysis_tm_nopad_call(
    blocks_tm: jax.Array,
    hw: jax.Array,
    A: jax.Array,
    laN: int,
    n_frames: int,
    Tt: int,
    Bb: int,
    interpret: bool,
    mR: int,
) -> jax.Array:
    """Kernel call on the UNPADDED block stream: the halo window start is
    clamped into bounds, which makes the edge frame tiles garbage (their
    windows would reach the zero history / zero tail); the wrapper
    recomputes exactly those frames with the XLA path and patches them in
    with an in-place dynamic-update-slice — no whole-tensor pad pass."""
    from jax.experimental import pallas as pl

    n_blocks, BC, D = blocks_tm.shape
    Mout = A.shape[1]
    M = A.shape[0]
    R = M // D
    m = mR // R
    W = Tt + mR - 1
    n_t = -(-n_frames // Tt)
    n_b = BC // Bb

    kernel = _make_analysis_tm_kernel(m, R, Tt, D, _kernel_prec())
    hi = n_blocks - W

    return pl.pallas_call(
        kernel,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(W), pl.Element(Bb), pl.Element(D)),
                lambda b, t: (
                    jnp.clip(laN + t * Tt - (mR - 1), 0, hi),
                    b * Bb,
                    0,
                ),
            ),
            pl.BlockSpec((mR, D), lambda b, t: (0, 0)),
            pl.BlockSpec((M, Mout), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, Bb, Mout), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((n_frames, BC, Mout), jnp.float32),
        interpret=interpret,
        compiler_params=_parallel_grid(),
    )(blocks_tm, hw, A)


def analysis_tm_fused(
    x: jax.Array,
    h: jax.Array,
    params,
    packed: bool = True,
    frame_tile: int = 8,
    batch_tile: int = 256,
    interpret: bool = False,
    edge_fixup: bool = True,
) -> jax.Array:
    """Fused Pallas analysis bank, time-major: ``x [..., T]`` ->
    ``Yr [n_frames, ..., Mout]`` — bit-compatible with
    `ops.filterbank.analysis_half_real_tm` (same operands, same
    accumulation order j-outer/k-inner, same DFT matrices).

    One kernel reads each D-sample block of the signal once per frame tile
    (halo factor ``(Tt+mR-1)/Tt``), runs the m-tap polyphase FIR in VMEM
    registers, and feeds the packed DFT matmul on the MXU — the ``w_j`` FIR
    tensors of the XLA path never touch HBM.  Requires the matmul-DFT
    regime and D % 128 == 0 (lane-aligned blocks).

    ``edge_fixup=True`` (default, when shapes allow): the signal is fed to
    the kernel UNPADDED — the few frames whose windows reach the zero
    history / zero tail are recomputed by the XLA path on tiny slices and
    patched in with dynamic-update-slice, saving the whole-tensor pad pass
    in HBM.
    """
    from . import dft
    from .filterbank import _pad_to_blocks, analysis_half_real_tm

    p = params
    D, M, m, R = p.D, p.M, p.m, p.R
    h = jnp.asarray(h, jnp.float32)
    if h.shape != (p.N,):
        raise ValueError(f"analysis prototype must have length N={p.N}, got {h.shape}")
    if M > dft.MATMUL_MAX_M:
        raise ValueError("analysis_tm_fused requires the DFT-matmul regime")
    if D % 128 != 0 and not interpret:
        raise ValueError("analysis_tm_fused requires D % 128 == 0")

    h_rev = h.reshape(m, M)[:, ::-1]
    # hw[j*m + k] = h_rev[k, j*D:(j+1)*D]
    hw = jnp.stack([h_rev[k, j * D : (j + 1) * D] for j in range(R) for k in range(m)])
    A = jnp.asarray(
        dft._analysis_matrix_packed(M) if packed else dft._analysis_matrix(M, half=True)
    )

    x = _pad_to_blocks(x.astype(jnp.float32), D)
    lead = x.shape[:-1]
    n_blocks = x.shape[-1] // D
    n_frames = n_blocks - p.laN + p.analysis_delay
    mR = m * R
    front = mR - 1

    BC = int(np.prod(lead)) if lead else 1
    Tt = max(8, min(frame_tile, -(-n_frames // 8) * 8))
    Bb = max(8, min(batch_tile, -(-BC // 8) * 8))
    n_t = -(-n_frames // Tt)
    n_b = -(-BC // Bb)
    x2 = x.reshape(BC, x.shape[-1])

    # Block-aligned halo fast path: with delay-compensation laN == mR - 1
    # (type 2, the default) the true window for frame tile t starts exactly
    # at block row t*Tt, so the kernel reads two adjacent BLOCK-indexed
    # tiles of the same array — standard block indexing Mosaic can
    # double-buffer — instead of an Element-indexed halo (which it cannot).
    # One tail/batch zero-pad pass gives the same semantics as the padded
    # fallback below (zero history is not needed: the front pad is zero
    # blocks wide exactly when laN == mR - 1).
    if p.laN == mR - 1 and Tt >= mR - 1:
        blocks_tm = jnp.transpose(x2.reshape(BC, -1, D), (1, 0, 2))
        need_t = (n_t + 1) * Tt
        need_b = n_b * Bb
        if need_t > n_blocks or need_b > BC:
            blocks_tm = jnp.pad(
                blocks_tm,
                ((0, max(need_t - n_blocks, 0)), (0, need_b - BC), (0, 0)),
            )
        Yr = _analysis_tm_blocked_call(
            blocks_tm, hw, A, n_frames, Tt, Bb, interpret, mR
        )
        Yr = Yr[:, :BC] if need_b > BC else Yr
        return Yr.reshape((n_frames,) + lead + (Yr.shape[-1],))

    W = Tt + mR - 1
    if edge_fixup and n_b * Bb == BC and n_blocks >= W:
        # tiles whose clamped window start differs from the true one
        s_true = [p.laN + t * Tt - (mR - 1) for t in range(n_t)]
        a = sum(1 for s in s_true if s < 0)  # bad prefix
        b0 = next((t for t, s in enumerate(s_true) if s > n_blocks - W), n_t)
        if a < b0:
            blocks = x2.reshape(BC, -1, D)
            blocks_tm = jnp.transpose(blocks, (1, 0, 2))  # [n_blocks, BC, D]
            Yr = _analysis_tm_nopad_call(
                blocks_tm, hw, A, p.laN, n_frames, Tt, Bb, interpret, mR
            )
            fix_front = min(a * Tt, n_frames)
            if fix_front:
                xf = x2[:, : (p.laN + fix_front) * D]
                ff = analysis_half_real_tm(xf, h, p, packed=packed)[:fix_front]
                Yr = jax.lax.dynamic_update_slice(Yr, ff, (0, 0, 0))
            fix_top = b0 * Tt
            if fix_top < n_frames:
                q0 = p.laN + fix_top - (mR - 1)
                xt = x2[:, q0 * D :]
                ft = analysis_half_real_tm(xt, h, p, packed=packed)
                off = fix_top - q0
                ft = jax.lax.slice_in_dim(ft, off, off + (n_frames - fix_top), axis=0)
                Yr = jax.lax.dynamic_update_slice(Yr, ft, (fix_top, 0, 0))
            return Yr.reshape((n_frames,) + lead + (Yr.shape[-1],))

    # Fallback: one pad pass covers everything the Element-indexed kernel
    # touches — front history, zero-padding tail, the halo of the last frame
    # tile, and whole batch tiles (all-Element specs have no partial-block
    # masking).
    tail = p.laN + n_t * Tt + mR - 1 - (front + n_blocks)
    if max(tail, 0) or front or n_b * Bb > BC:
        x2 = jnp.pad(x2, ((0, n_b * Bb - BC), (front * D, max(tail, 0) * D)))
    blocks = x2.reshape(x2.shape[0], -1, D)  # [BC', n_blocks', D]

    blocks_tm = jnp.transpose(blocks, (1, 0, 2))  # [n_blocks', BC', D]
    Yr = _analysis_tm_fused_call(blocks_tm, hw, A, p.laN, n_frames, Tt, Bb, interpret)
    Yr = Yr[:, :BC] if n_b * Bb > BC else Yr
    return Yr.reshape((n_frames,) + lead + (Yr.shape[-1],))


def _make_synthesis_tm_kernel(m: int, R: int, Tt: int, D: int, prec):
    """Fused synthesis kernel body: packed DFT matmul + polyphase FIR +
    overlap-add (modulated.cc:551-606 algebra, see
    `ops.filterbank.synthesis_half_real_tm` / `_synthesis_from_c_tm`).

    Refs: yp [Tt + m*R - 1, Bb, M] (packed spectrum halo, Element-indexed at
    ``t*Tt`` on the PRE-padded stream — see `synthesis_tm_fused`), S [M, M]
    (packed synthesis DFT matrix, segment reversal baked in), gf [m*R? no —
    m, M] permuted prototype rows, out [Tt, Bb, D].

    Local index algebra (halo width m*R-1, ``u`` = s-row within tile):
      c_local[l]  = yp_local[l] @ S                    (l = 0 .. Tt+mR-2)
      s_local[u]  = sum_k gf[k] * c_local[u + (m-1-k)R]  (u = 0 .. Tt+R-2)
                    == s[t0 + u - (R-1)]  globally; rows with negative
                    global index are zeroed (the OLA history is empty)
      out[v]      = sum_j s_local[v + R-1-j][(R-1-j)D : (R-j)D]
    """

    from jax.experimental import pallas as pl

    def kernel(yp_ref, S_ref, gf_ref, out_ref):
        Bb = out_ref.shape[1]
        W = Tt + m * R - 1
        M = S_ref.shape[0]
        c = jax.lax.dot_general(
            yp_ref[:].reshape(W * Bb, M),
            S_ref[:],
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        ).reshape(W, Bb, M)
        nS = Tt + R - 1
        s = None
        for k in range(m):
            term = gf_ref[k, :][None, None, :] * c[(m - 1 - k) * R : (m - 1 - k) * R + nS]
            s = term if s is None else s + term
        # Zero the rows whose global s index t0 + u - (R-1) is negative
        # (only the first tile has any).
        t0 = pl.program_id(1) * Tt
        u = jax.lax.broadcasted_iota(jnp.int32, (nS, 1, 1), 0)
        s = jnp.where(t0 + u - (R - 1) < 0, 0.0, s)
        out = None
        for j in range(R):
            seg = s[R - 1 - j : R - 1 - j + Tt, :, (R - 1 - j) * D : (R - j) * D]
            out = seg if out is None else out + seg
        out_ref[:] = out

    return kernel


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _synthesis_tm_fused_call(
    ypp: jax.Array,
    S: jax.Array,
    gf: jax.Array,
    R: int,
    T_out: int,
    Tt: int,
    Bb: int,
    interpret: bool,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from . import dft

    n_in, B, M = ypp.shape
    m = gf.shape[0]
    D = M // R
    n_t = -(-T_out // Tt)
    n_b = -(-B // Bb)
    need_t = n_t * Tt + m * R - 1
    need_b = n_b * Bb
    if need_t > n_in or need_b > B:
        ypp = jnp.pad(
            ypp, ((0, max(need_t - n_in, 0)), (0, max(need_b - B, 0)), (0, 0))
        )

    kernel = _make_synthesis_tm_kernel(m, R, Tt, D, _kernel_prec())
    return pl.pallas_call(
        kernel,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(Tt + m * R - 1), pl.Element(Bb), pl.Element(M)),
                lambda b, t: (t * Tt, b * Bb, 0),
            ),
            pl.BlockSpec((M, M), lambda b, t: (0, 0)),
            pl.BlockSpec((m, M), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, Bb, D), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T_out, B, D), jnp.float32),
        interpret=interpret,
        compiler_params=_parallel_grid(),
    )(ypp, S, gf)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _synthesis_tm_nopad_call(
    ypp: jax.Array,
    S: jax.Array,
    gf: jax.Array,
    R: int,
    T_out: int,
    Tt: int,
    Bb: int,
    interpret: bool,
    pre: int,
    m: int,
) -> jax.Array:
    """Kernel call on the UNPADDED packed spectrum: the halo window start is
    clamped into bounds; the edge output tiles are garbage and the wrapper
    patches them with the XLA path (see `_analysis_tm_nopad_call`)."""
    from jax.experimental import pallas as pl

    n_in, B, M = ypp.shape
    D = M // R
    W = Tt + m * R - 1
    n_t = -(-T_out // Tt)
    n_b = B // Bb
    hi = n_in - W

    kernel = _make_synthesis_tm_kernel(m, R, Tt, D, _kernel_prec())
    return pl.pallas_call(
        kernel,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(W), pl.Element(Bb), pl.Element(M)),
                lambda b, t: (jnp.clip(t * Tt - pre, 0, hi), b * Bb, 0),
            ),
            pl.BlockSpec((M, M), lambda b, t: (0, 0)),
            pl.BlockSpec((m, M), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, Bb, D), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T_out, B, D), jnp.float32),
        interpret=interpret,
        compiler_params=_parallel_grid(),
    )(ypp, S, gf)


def synthesis_tm_fused(
    Yp: jax.Array,
    g: jax.Array,
    params,
    frame_tile: int = 8,
    batch_tile: int = 128,
    interpret: bool = False,
    edge_fixup: bool = True,
) -> jax.Array:
    """Fused Pallas synthesis bank consuming the packed time-major spectrum:
    ``Yp [T_in, ..., M]`` (``[Re(0..M/2) | Im(1..M/2-1)]`` lanes) -> samples
    ``[..., (T_in - synthesis_delay) * D]`` — bit-compatible with
    `ops.filterbank.synthesis_half_real_tm` (same packed DFT matrix with the
    segment reversal baked in, same tap order).

    One kernel runs the [M, M] DFT matmul on a frame-tile halo, the m-tap
    polyphase FIR in VMEM registers, and the R-segment overlap-add — the
    ``c`` and ``s`` tensors of the XLA path never touch HBM.  The DFT matmul
    is recomputed on the halo (factor ``(Tt+mR-1)/Tt``).
    """
    from . import dft

    p = params
    D, M, m, R = p.D, p.M, p.m, p.R
    if M > dft.MATMUL_MAX_M:
        raise ValueError("synthesis_tm_fused requires the DFT-matmul regime")
    if D % 128 != 0 and not interpret:
        raise ValueError("synthesis_tm_fused requires D % 128 == 0")
    pd = p.synthesis_delay
    T_in = Yp.shape[0]
    T_out = T_in - pd
    if T_out <= 0:
        raise ValueError(f"need more than {pd} subband frames, got {T_in}")

    perm = list(dft.segment_reversal_perm(M, R))
    S = jnp.asarray(np.asarray(dft._synthesis_half_matrix_packed(M))[:, perm])
    gf = np.asarray(g, np.float32).reshape(m, M)[:, ::-1][:, perm]
    gf = jnp.asarray(gf)

    lead = Yp.shape[1:-1]
    ypp = Yp.astype(jnp.float32).reshape(T_in, -1, M)
    B = ypp.shape[1]
    Tt = max(8, min(frame_tile, -(-T_out // 8) * 8))
    Bb = max(8, min(batch_tile, -(-B // 8) * 8))
    n_t = -(-T_out // Tt)
    n_b = -(-B // Bb)
    # The kernel's local algebra puts c frame ``t0 + l + pd - (mR - 1)`` at
    # local slot l, i.e. the halo window for output tile t starts ``pre =
    # mR - 1 - pd`` frames before ``t*Tt`` on the spectrum stream.
    pre = m * R - 1 - pd
    yppc = ypp if pre >= 0 else ypp[-pre:]
    prec_ = max(pre, 0)
    W = Tt + m * R - 1

    if edge_fixup and n_b * Bb == B and yppc.shape[0] >= W:
        from .filterbank import synthesis_half_real_tm

        starts = [t * Tt - prec_ for t in range(n_t)]
        hi = yppc.shape[0] - W
        a = sum(1 for s in starts if s < 0)
        b0 = next((t for t, s in enumerate(starts) if s > hi), n_t)
        # contamination reach of a zero history in the sub-call:
        # local out frame v needs c frames >= v + pd - (mR - 1) - (R - 1)
        v0 = max(m * R + R - 2 - pd, 0)
        if a < b0 and (b0 >= n_t or b0 * Tt >= v0):
            out = _synthesis_tm_nopad_call(
                yppc, S, gf, R, T_out, Tt, Bb, interpret, prec_, m
            )
            fix_front = min(a * Tt, T_out)
            if fix_front:
                ff = synthesis_half_real_tm(Yp[: fix_front + pd], g, p)
                ff = jnp.moveaxis(ff.reshape(lead + (fix_front, D)), -2, 0)
                out = jax.lax.dynamic_update_slice(
                    out, ff.reshape(fix_front, B, D), (0, 0, 0)
                )
            fix_top = b0 * Tt
            if fix_top < T_out:
                q0 = fix_top - v0
                ft = synthesis_half_real_tm(Yp[q0:], g, p)
                cnt = T_out - fix_top
                ft = ft[..., v0 * D : (v0 + cnt) * D]
                ft = jnp.moveaxis(ft.reshape(lead + (cnt, D)), -2, 0)
                out = jax.lax.dynamic_update_slice(
                    out, ft.reshape(cnt, B, D), (fix_top, 0, 0)
                )
            out = jnp.moveaxis(out, 0, -2)
            return out.reshape(lead + (T_out * D,))

    # Fallback: one pad pass makes every Element start in bounds (zero
    # history, halo tail, whole batch tiles).
    post = n_t * Tt + m * R - 1 - (prec_ + yppc.shape[0])
    if prec_ or max(post, 0) or n_b * Bb > B:
        yppc = jnp.pad(yppc, ((prec_, max(post, 0)), (0, n_b * Bb - B), (0, 0)))
    out = _synthesis_tm_fused_call(yppc, S, gf, R, T_out, Tt, Bb, interpret)
    out = out[:, :B] if n_b * Bb > B else out
    out = jnp.moveaxis(out, 0, -2)  # [..., T_out, D]
    return out.reshape(lead + (T_out * D,))


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
