"""Pallas TPU kernel for the WPE lag-covariance accumulation (config 4).

The XLA WPE estimate (models/dereverberation.wpe_estimate) materializes the
stacked lag tensor ``L [T, F, C*P]`` and its per-target weighting
``Lw = w*L`` in HBM (1.7 GB + 6.6 GB per 64-utterance chunk-iteration at
bench shapes) and contracts them with 20-wide minor dims that pad 2x on the
TPU tile grid — measured ~8% of HBM peak.  This kernel keeps the lag views
IN VMEM: per grid cell (one utterance x one 6-bin group) it builds the
``C*P`` lane-shifted views of the subband rows, computes the prediction
residual/variance weights in place, and accumulates the normal-equation
blocks

    R[c,p,q] = sum_t w_c[t] * L[t,p] * conj(L[t,q])      (calc_Rr_,
    r[c,p]   = sum_t w_c[t] * conj(y_c[t]) * L[t,p]       dereverberation.cc:96-142)

as four real MXU matmuls ``[512, W] x [128, W]^T`` with the 6 bins packed
into the tile (rows = (c, a, dp, fl), cols = (b, dq, fl); the fl-diagonal
blocks are extracted by XLA afterwards — a cheap strided copy).  The same
kernel in ``resid`` mode emits ``y - pred`` directly, which IS the WPE apply
(dereverberation.cc:227-275) when given the tap-truncated final filters.

Layout: time on lanes (``W = ceil(T/128)*128`` columns), bins on sublanes in
groups of ``FL = 6`` interleaved with channels (rows ``a*FL + fl``); lag
shifts are lane-wise static concats, so no lag tensor ever touches HBM.
Complex arithmetic runs on separate re/im f32 planes (the
models/pallas_fused_scan.py convention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["wpe_stats_pallas", "wpe_resid_pallas", "pallas_wpe_supported"]

FL = 6  # bins per grid cell (f-group); 129 half-band bins -> 22 groups
SUBBAND_FLOOR = 1.0e-3  # dereverberation.cc:144


def pallas_wpe_supported(C: int, P: int) -> bool:
    """Row budgets: A rows (C*C*P + C)*FL <= 512, B rows C*P*FL <= 128."""
    return (C * C * P + C) * FL <= 512 and C * P * FL <= 128


def _shift(z, s):
    """Lane-shift right by ``s`` (prepend zeros): a view of y[t - s].

    Mosaic cannot lower lane-concats at non-tile offsets ("result/input
    offset mismatch"), so the shift is a circular ``pltpu.roll`` with the
    wrapped lanes masked to zero (anything wrapping from the tail lands in
    lanes < s, which are zeroed)."""
    if s == 0:
        return z
    from jax.experimental.pallas import tpu as pltpu

    rolled = pltpu.roll(z, s, axis=z.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1)
    return jnp.where(lane >= s, rolled, 0.0)


def _make_kernel(C: int, P: int, lowerN: int, T: int, mode: str,
                 has_g: bool = True, bf16: bool = False):
    """Refs (leading block-1 dims already squeezed by indexing):
    yr/yi [C*FL, W] subband planes (row a*FL+fl), gr/gi [C*FL, CP*FL]
    fl-diagonal EXPANDED filters (row c*FL+fl, col j*FL+fl', zero unless
    fl'==fl — built by `_g_planes` in XLA) so the prediction is one MXU
    matmul against the lag matrix instead of a CP-long VPU loop.
    mode 'stats': outputs raw product planes [512, 128]; mode 'resid':
    outputs [C*FL, W] residual planes.  ``has_g=False`` skips the
    prediction (first EM iteration, G == 0)."""
    CP = C * P
    nrows = C * CP * FL

    def kernel(yr_ref, yi_ref, gr_ref, gi_ref, out0, out1):
        W = yr_ref.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (C * FL, W), 1)
        valid = (lane >= lowerN) & (lane < T)
        inframe = lane < T

        y_r = [yr_ref[0, 0, a * FL:(a + 1) * FL, :] for a in range(C)]
        y_i = [yi_ref[0, 0, a * FL:(a + 1) * FL, :] for a in range(C)]

        # ---- lag views: V[(a, dp)] = y_a[t - lowerN - dp], [FL, W] ----
        Vr, Vi = [], []
        for a in range(C):
            for dp in range(P):
                s = lowerN + dp
                Vr.append(_shift(y_r[a], s))
                Vi.append(_shift(y_i[a], s))

        # ---- lag matrix [CP*FL, W], rows (j, fl) — shared by the
        # prediction matmul and (padded) the stats B operand ----
        Lr = jnp.concatenate(Vr, axis=0)
        Li = jnp.concatenate(Vi, axis=0)

        # ---- prediction for ALL target channels as one MXU matmul:
        # pred[(c,fl), t] = sum_(j,fl') Gexp[(c,fl),(j,fl')] * L[(j,fl'), t]
        # (Gexp fl-diagonal) — replaces the C*CP-iteration VPU loop ----
        yfull_r = yr_ref[0, 0]
        yfull_i = yi_ref[0, 0]
        if has_g:
            g_r = gr_ref[0, 0]  # [C*FL, CP*FL]
            g_i = gi_ref[0, 0]
            dnp = (((1,), (0,)), ((), ()))
            pdot = partial(jax.lax.dot_general, dimension_numbers=dnp,
                           preferred_element_type=jnp.float32)
            # conj(G) * V
            pr = pdot(g_r, Lr) + pdot(g_i, Li)
            pi = pdot(g_r, Li) - pdot(g_i, Lr)
            rr_full = yfull_r - jnp.where(valid, pr, 0.0)
            ri_full = yfull_i - jnp.where(valid, pi, 0.0)
        else:
            rr_full = yfull_r
            ri_full = yfull_i

        if mode == "resid":
            out0[0, 0] = jnp.where(inframe, rr_full, 0.0)
            out1[0, 0] = jnp.where(inframe, ri_full, 0.0)
            return

        mag = jnp.sqrt(rr_full * rr_full + ri_full * ri_full)
        theta = jnp.maximum(mag, jnp.float32(SUBBAND_FLOOR)) ** 2
        w_full = jnp.where(valid, 1.0 / theta, 0.0)
        Wc = [w_full[c * FL:(c + 1) * FL, :] for c in range(C)]

        # ---- A [512, W]: rows (c, a, dp, fl) = w_c * V_(a,dp); then the
        # r rows (c, fl) = w_c * y_c (conjugation folded into the output
        # combine: r rows take the negated Im of A x conj(B)) ----
        Ar_blocks, Ai_blocks = [], []
        for c in range(C):
            for j in range(CP):
                Ar_blocks.append(Wc[c] * Vr[j])
                Ai_blocks.append(Wc[c] * Vi[j])
        Ar_blocks.append(w_full * yfull_r)
        Ai_blocks.append(w_full * yfull_i)
        pad = 512 - (nrows + C * FL)
        if pad:
            Ar_blocks.append(jnp.zeros((pad, W), jnp.float32))
            Ai_blocks.append(jnp.zeros((pad, W), jnp.float32))
        Ar = jnp.concatenate(Ar_blocks, axis=0)
        Ai = jnp.concatenate(Ai_blocks, axis=0)

        # ---- B2 [128, W]: rows (b, dq, fl) = V_(b,dq), unconjugated ----
        bpad = 128 - CP * FL
        if bpad:
            zpad = jnp.zeros((bpad, W), jnp.float32)
            Br = jnp.concatenate([Lr, zpad], axis=0)
            Bi = jnp.concatenate([Li, zpad], axis=0)
        else:
            Br, Bi = Lr, Li

        dn = (((1,), (1,)), ((), ()))
        dot = partial(jax.lax.dot_general, dimension_numbers=dn,
                      preferred_element_type=jnp.float32)
        if bf16:
            # opt-in (PipelineConfig.wpe_bf16_stats): the accumulation
            # matmuls dominate the WPE estimate on v5e; bf16 operands with
            # f32 accumulation run the MXU at native rate.  The EM weights
            # 1/theta and the solve stay f32; bench reports the measured
            # end-to-end deviation vs the f32 path alongside the speedup.
            Ar, Ai = Ar.astype(jnp.bfloat16), Ai.astype(jnp.bfloat16)
            Br, Bi = Br.astype(jnp.bfloat16), Bi.astype(jnp.bfloat16)
        # Every row wants A x conj(B): re = M1+M2, im = P4-P3 (r rows then
        # negate im, which restores w*conj(y)*V).  Karatsuba 3-matmul form:
        # P4-P3 = M3 + M1 - M2 with M3 = (Ai-Ar)(Br+Bi) — one [512,W]x
        # [W,128] MXU pass fewer than the naive 4-product complex multiply.
        M1 = dot(Ar, Br)
        M2 = dot(Ai, Bi)
        M3 = dot((Ai - Ar), (Br + Bi))
        re = M1 + M2
        im = M3 + M1 - M2

        row = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        is_R = row < nrows
        out0[0, 0] = re
        out1[0, 0] = jnp.where(is_R, im, -im)

    return kernel


def _tm_planes(X: jax.Array, nG: int):
    """[B, C, T, F] complex -> re/im planes [B, nG, C*FL, W]."""
    B, C, T, F = X.shape
    W = -(-T // 128) * 128
    Xt = jnp.moveaxis(X, 2, 3)  # [B, C, F, T]
    Xt = jnp.pad(Xt, ((0, 0), (0, 0), (0, nG * FL - F), (0, W - T)))
    Xt = Xt.reshape(B, C, nG, FL, W)
    Xt = jnp.moveaxis(Xt, 2, 1).reshape(B, nG, C * FL, W)
    return jnp.real(Xt), jnp.imag(Xt)


def _g_planes(G: jax.Array, nG: int):
    """[B, C, F, CP] complex -> fl-diagonal expanded re/im planes
    [B, nG, C*FL, CP*FL]: col (j, fl') holds G[.., fl, j] iff fl' == fl
    (row = c*FL + fl), zero otherwise — the layout that lets the kernel
    compute the prediction for all C targets as a single MXU matmul
    against the [CP*FL, W] lag matrix."""
    B, C, F, CP = G.shape
    Gp = jnp.pad(G, ((0, 0), (0, 0), (0, nG * FL - F), (0, 0)))
    Gp = Gp.reshape(B, C, nG, FL, CP)
    Gp = jnp.moveaxis(Gp, 2, 1).reshape(B, nG, C * FL, CP)
    # expand: [B, nG, CFL, CP] -> [B, nG, CFL, CP, FL] masked -> [.., CP*FL]
    fl_of_row = jnp.tile(jnp.arange(FL), C)  # row -> fl
    mask = (fl_of_row[:, None] == jnp.arange(FL)[None, :])  # [CFL, FL]
    Ge = Gp[..., None] * mask[None, None, :, None, :].astype(Gp.dtype)
    Ge = Ge.reshape(B, nG, C * FL, CP * FL)
    return jnp.real(Ge), jnp.imag(Ge)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _call(Yr, Yi, Gr, Gi, C, lowerN, P, T, mode, interpret=False, has_g=True,
          bf16=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nG, CFL, W = Yr.shape
    CP = C * P
    kernel = _make_kernel(C, P, lowerN, T, mode, has_g,
                          bf16 and mode == "stats")

    in_specs = [
        pl.BlockSpec((1, 1, CFL, W), lambda b, g: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, CFL, W), lambda b, g: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, CFL, CP * FL), lambda b, g: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, CFL, CP * FL), lambda b, g: (b, g, 0, 0)),
    ]
    if mode == "stats":
        out_shape = [
            jax.ShapeDtypeStruct((B, nG, 512, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, nG, 512, 128), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, 512, 128), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, 512, 128), lambda b, g: (b, g, 0, 0)),
        ]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((B, nG, CFL, W), jnp.float32),
            jax.ShapeDtypeStruct((B, nG, CFL, W), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, CFL, W), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, CFL, W), lambda b, g: (b, g, 0, 0)),
        ]

    return pl.pallas_call(
        kernel,
        grid=(B, nG),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(Yr, Yi, Gr, Gi)


def wpe_stats_from_planes(Yr, Yi, G, C, T, F, lowerN, P,
                          interpret=False, has_g=True, bins_minor=False,
                          bf16=False):
    """Stats from precomputed subband planes (see `wpe_stats_pallas`).

    ``bins_minor=True`` returns ``(R [B, C, CP, CP, Fpad],
    r [B, C, CP, Fpad])`` with the (zero-padded) bin axis minor — the
    lane-efficient layout for the elementwise Gauss-Jordan solve
    (`gj_solve_pallas`).
    """
    B, nG = Yr.shape[0], Yr.shape[1]
    CP = C * P
    Gr, Gi = _g_planes(G, nG)
    raw_re, raw_im = _call(Yr, Yi, Gr, Gi, C, lowerN, P, T, "stats",
                           interpret, has_g, bf16)
    nrows = C * CP * FL

    eyeFL = jnp.eye(FL, dtype=jnp.float32)

    def deint(re, im, lead, spec):
        """rows [.., lead, FL interleaved..] x cols (q, FL): take fl-diag.

        Realized as a mask-and-reduce einsum rather than jnp.diagonal —
        the 6D diagonal+transpose lowered to a slow gather (~40 ms per
        stats call at config-4 shapes); the masked reduction is one fused
        streaming pass over the dump.  ``spec`` picks the OUTPUT axis order
        so any required transpose is folded into that same pass (the
        explicit 6D bins-minor transpose afterwards cost ~8.5 ms per stats
        call on v5e — 10x off bandwidth)."""
        rr = re.reshape(re.shape[:2] + (lead, FL, CP, FL))
        ii = im.reshape(im.shape[:2] + (lead, FL, CP, FL))
        d_r = jnp.einsum(spec, rr, eyeFL)
        d_i = jnp.einsum(spec, ii, eyeFL)
        return jax.lax.complex(d_r, d_i)

    rawR_re = raw_re[:, :, :nrows, :CP * FL]
    rawR_im = raw_im[:, :, :nrows, :CP * FL]
    rawr_re = raw_re[:, :, nrows:nrows + C * FL, :CP * FL]
    rawr_im = raw_im[:, :, nrows:nrows + C * FL, :CP * FL]
    if bins_minor:
        # (A/B-measured on v5e: folding the bins-minor transpose into the
        # einsum output order is NOT faster than transposing after — XLA
        # streams the 6D transpose fine; keep the simple spec)
        Rd = deint(rawR_re, rawR_im, C * CP, "bnrfqg,fg->bnrqf")
        Rd = Rd.reshape(B, nG, C, CP, CP, FL)
        rd = deint(rawr_re, rawr_im, C, "bnrfqg,fg->bnrqf")
        rd = rd.reshape(B, nG, C, CP, FL)
        R = Rd.transpose(0, 2, 3, 4, 1, 5).reshape(B, C, CP, CP, nG * FL)
        r = rd.transpose(0, 2, 3, 1, 4).reshape(B, C, CP, nG * FL)
        return R, r
    # R rows: [B, nG, C*CP, FL(row), CP, FL(col)] -> diag -> [B,nG,C*CP,CP,FL]
    Rd = deint(rawR_re, rawR_im, C * CP, "bnrfqg,fg->bnrqf")
    Rd = Rd.reshape(B, nG, C, CP, CP, FL)
    rd = deint(rawr_re, rawr_im, C, "bnrfqg,fg->bnrqf")
    rd = rd.reshape(B, nG, C, CP, FL)
    R = jnp.moveaxis(Rd, -1, 2).reshape(B, nG * FL, C, CP, CP)[:, :F]
    R = jnp.moveaxis(R, 1, 2)  # [B, C, F, CP, CP]
    r = jnp.moveaxis(rd, -1, 2).reshape(B, nG * FL, C, CP)[:, :F]
    r = jnp.moveaxis(r, 1, 2)  # [B, C, F, CP]
    return R, r


def wpe_resid_from_planes(Yr, Yi, G, C, T, F, lowerN, P, interpret=False):
    """Residual from precomputed planes (see `wpe_resid_pallas`)."""
    B, nG = Yr.shape[0], Yr.shape[1]
    Gr, Gi = _g_planes(G, nG)
    rr, ri = _call(Yr, Yi, Gr, Gi, C, lowerN, P, T, "resid", interpret)
    out = jax.lax.complex(rr, ri).reshape(B, nG, C, FL, -1)
    out = jnp.moveaxis(out, 2, 1).reshape(B, C, nG * FL, -1)[:, :, :F, :T]
    return jnp.moveaxis(out, 2, 3)  # [B, C, T, F]


def wpe_stats_pallas(X: jax.Array, G: jax.Array, lowerN: int, P: int,
                     interpret: bool = False):
    """Normal-equation stats for one WPE EM iteration, batched.

    ``X``: [B, C, T, F] complex subband frames; ``G``: [B, C, F, C*P]
    complex current filters (zeros on the first iteration).  Returns
    ``(R [B, C, F, CP, CP], r [B, C, F, CP])`` complex64 — identical (f32
    reassociation) to the einsum path in models/dereverberation.wpe_estimate.
    """
    B, C, T, F = X.shape
    nG = -(-F // FL)
    Yr, Yi = _tm_planes(X, nG)
    return wpe_stats_from_planes(Yr, Yi, G, C, T, F, lowerN, P, interpret)


def wpe_resid_pallas(X: jax.Array, G: jax.Array, lowerN: int, P: int,
                     interpret: bool = False) -> jax.Array:
    """``y - pred`` with the prediction gated to ``t >= lowerN`` — the WPE
    apply when ``G`` is the (tap-truncated) final filter, and the EM
    residual otherwise.  ``X``: [B, C, T, F]; ``G``: [B, C, F, C*P].
    Returns [B, C, T, F] complex64.
    """
    B, C, T, F = X.shape
    nG = -(-F // FL)
    Yr, Yi = _tm_planes(X, nG)
    return wpe_resid_from_planes(Yr, Yi, G, C, T, F, lowerN, P, interpret)


# ---------------------------------------------------------------------------
# VMEM-resident Gauss-Jordan solve for the per-bin normal equations
# ---------------------------------------------------------------------------


def _make_gj_kernel(n: int):
    """Solve ``A[:, :n] x = A[:, n]`` for 128 lane-parallel n x n complex
    systems per cell.  The XLA elimination (models/dereverberation._gj_solve)
    re-reads and re-writes the whole augmented array from HBM on each of the
    n pivot steps (~18 GB at config-4 shapes); here the augmented system
    stays in VMEM scratch across all steps (~0.9 GB total traffic)."""

    def kernel(ar_ref, ai_ref, xr_ref, xi_ref, sr, si):
        sr[...] = ar_ref[0]
        si[...] = ai_ref[0]
        for k in range(n):
            pr = sr[k, k:k + 1, :]
            pi = si[k, k:k + 1, :]
            den = pr * pr + pi * pi
            den = jnp.where(den > 0, den, 1.0)
            # piv_row = A[k] / A[k, k]
            qr = (sr[k] * pr + si[k] * pi) / den
            qi = (si[k] * pr - sr[k] * pi) / den
            for p in range(n):
                if p == k:
                    continue
                fr = sr[p, k:k + 1, :]
                fi = si[p, k:k + 1, :]
                sr[p] = sr[p] - (fr * qr - fi * qi)
                si[p] = si[p] - (fr * qi + fi * qr)
            sr[k] = qr
            si[k] = qi
        xr_ref[0] = sr[:, n, :]
        xi_ref[0] = si[:, n, :]

    return kernel


@partial(jax.jit, static_argnums=(2,))
def gj_solve_pallas(R: jax.Array, r: jax.Array, interpret: bool = False):
    """Batched HPD solve ``R x = r`` with lane-parallel systems.

    ``R``: [..., n, n, L] complex, ``r``: [..., n, L] -> [..., n, L].
    The leading batch dims and L are flattened onto the lane grid; L (and
    the batch) need not be lane-aligned — pad lanes solve garbage that
    never crosses lanes and is cropped on return.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *lead, n, n2, L = R.shape
    assert n == n2
    A = jnp.concatenate([R, r[..., None, :]], axis=-2)  # [..., n, n+1, L]
    Af = A.reshape(-1, n, n + 1, L)
    Bf = Af.shape[0]
    nL = -(-L // 128)
    Af = jnp.pad(Af, ((0, 0), (0, 0), (0, 0), (0, nL * 128 - L)))
    kernel = _make_gj_kernel(n)
    xr, xi = pl.pallas_call(
        kernel,
        grid=(Bf, nL),
        in_specs=[
            pl.BlockSpec((1, n, n + 1, 128), lambda b, l: (b, 0, 0, l)),
            pl.BlockSpec((1, n, n + 1, 128), lambda b, l: (b, 0, 0, l)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 128), lambda b, l: (b, 0, l)),
            pl.BlockSpec((1, n, 128), lambda b, l: (b, 0, l)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bf, n, nL * 128), jnp.float32),
            jax.ShapeDtypeStruct((Bf, n, nL * 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n + 1, 128), jnp.float32),
            pltpu.VMEM((n, n + 1, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(jnp.real(Af), jnp.imag(Af))
    x = jax.lax.complex(xr, xi)[..., :L]
    return x.reshape(*lead, n, L)
