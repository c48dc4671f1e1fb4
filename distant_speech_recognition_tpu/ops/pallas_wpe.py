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
    yr/yi [C*FL, W] subband planes (row a*FL+fl), gr/gi [C*FL, CP] filters
    (row c*FL+fl).  mode 'stats': outputs raw product planes [512, 128];
    mode 'resid': outputs [C*FL, W] residual planes.  ``has_g=False`` skips
    the prediction loop (first EM iteration, G == 0)."""
    CP = C * P
    nrows = C * CP * FL

    def kernel(yr_ref, yi_ref, gr_ref, gi_ref, out0, out1):
        W = yr_ref.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (FL, W), 1)
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

        # ---- pred/resid per target channel ----
        Wc, res_r, res_i = [], [], []
        for c in range(C):
            if has_g:
                g_r = gr_ref[0, 0, c * FL:(c + 1) * FL, :]  # [FL, CP]
                g_i = gi_ref[0, 0, c * FL:(c + 1) * FL, :]
                pr = jnp.zeros((FL, W), jnp.float32)
                pi = jnp.zeros((FL, W), jnp.float32)
                for j in range(CP):
                    gr_j = g_r[:, j][:, None]
                    gi_j = g_i[:, j][:, None]
                    # conj(G) * V
                    pr = pr + gr_j * Vr[j] + gi_j * Vi[j]
                    pi = pi + gr_j * Vi[j] - gi_j * Vr[j]
                pr = jnp.where(valid, pr, 0.0)
                pi = jnp.where(valid, pi, 0.0)
                rr = y_r[c] - pr
                ri = y_i[c] - pi
            else:
                rr = y_r[c]
                ri = y_i[c]
            if mode == "resid":
                res_r.append(jnp.where(inframe, rr, 0.0))
                res_i.append(jnp.where(inframe, ri, 0.0))
            else:
                mag = jnp.sqrt(rr * rr + ri * ri)
                theta = jnp.maximum(mag, jnp.float32(SUBBAND_FLOOR)) ** 2
                Wc.append(jnp.where(valid, 1.0 / theta, 0.0))

        if mode == "resid":
            out0[0, 0] = jnp.concatenate(res_r, axis=0)
            out1[0, 0] = jnp.concatenate(res_i, axis=0)
            return

        # ---- A [512, W]: rows (c, a, dp, fl) = w_c * V_(a,dp); then the
        # r rows (c, fl) = w_c * conj(y_c) ----
        Ar_blocks, Ai_blocks = [], []
        for c in range(C):
            for j in range(CP):
                Ar_blocks.append(Wc[c] * Vr[j])
                Ai_blocks.append(Wc[c] * Vi[j])
        for c in range(C):
            Ar_blocks.append(Wc[c] * y_r[c])
            Ai_blocks.append(-(Wc[c] * y_i[c]))
        pad = 512 - (nrows + C * FL)
        if pad:
            Ar_blocks.append(jnp.zeros((pad, W), jnp.float32))
            Ai_blocks.append(jnp.zeros((pad, W), jnp.float32))
        Ar = jnp.concatenate(Ar_blocks, axis=0)
        Ai = jnp.concatenate(Ai_blocks, axis=0)

        # ---- B2 [128, W]: rows (b, dq, fl) = V_(b,dq), unconjugated ----
        bpad = 128 - CP * FL
        Br_blocks = list(Vr) + ([jnp.zeros((bpad, W), jnp.float32)] if bpad else [])
        Bi_blocks = list(Vi) + ([jnp.zeros((bpad, W), jnp.float32)] if bpad else [])
        Br = jnp.concatenate(Br_blocks, axis=0)
        Bi = jnp.concatenate(Bi_blocks, axis=0)

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
        P1 = dot(Ar, Br)
        P2 = dot(Ai, Bi)
        P3 = dot(Ar, Bi)
        P4 = dot(Ai, Br)

        # R rows contract against conj(L): re = P1+P2, im = P4-P3.
        # r rows hold w*conj(y) and contract against L itself (no conj):
        # re = P1-P2, im = P3+P4.
        row = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        is_R = row < nrows
        out0[0, 0] = jnp.where(is_R, P1 + P2, P1 - P2)
        out1[0, 0] = jnp.where(is_R, P4 - P3, P3 + P4)

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
    """[B, C, F, CP] complex -> re/im [B, nG, C*FL, CP]."""
    B, C, F, CP = G.shape
    Gp = jnp.pad(G, ((0, 0), (0, 0), (0, nG * FL - F), (0, 0)))
    Gp = Gp.reshape(B, C, nG, FL, CP)
    Gp = jnp.moveaxis(Gp, 2, 1).reshape(B, nG, C * FL, CP)
    return jnp.real(Gp), jnp.imag(Gp)


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
        pl.BlockSpec((1, 1, CFL, CP), lambda b, g: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, CFL, CP), lambda b, g: (b, g, 0, 0)),
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

    def deint(re, im, lead):
        """rows [.., lead, FL interleaved..] x cols (q, FL): take fl-diag.

        Realized as a mask-and-reduce einsum rather than jnp.diagonal —
        the 6D diagonal+transpose lowered to a slow gather (~40 ms per
        stats call at config-4 shapes); the masked reduction is one fused
        streaming pass over the dump."""
        rr = re.reshape(re.shape[:2] + (lead, FL, CP, FL))
        ii = im.reshape(im.shape[:2] + (lead, FL, CP, FL))
        d_r = jnp.einsum("bnrfqg,fg->bnrqf", rr, eyeFL)
        d_i = jnp.einsum("bnrfqg,fg->bnrqf", ii, eyeFL)
        return jax.lax.complex(d_r, d_i)

    # R rows: [B, nG, C*CP, FL(row), CP, FL(col)] -> diag -> [B,nG,C*CP,CP,FL]
    Rd = deint(raw_re[:, :, :nrows, :CP * FL], raw_im[:, :, :nrows, :CP * FL],
               C * CP)
    Rd = Rd.reshape(B, nG, C, CP, CP, FL)
    rd = deint(raw_re[:, :, nrows:nrows + C * FL, :CP * FL],
               raw_im[:, :, nrows:nrows + C * FL, :CP * FL], C)
    rd = rd.reshape(B, nG, C, CP, FL)
    if bins_minor:
        R = Rd.transpose(0, 2, 3, 4, 1, 5).reshape(B, C, CP, CP, nG * FL)
        r = rd.transpose(0, 2, 3, 1, 4).reshape(B, C, CP, nG * FL)
        return R, r
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
