"""Pallas TPU kernel for the fused GSC-RLS + Zelinski scan.

The XLA `lax.scan` path (adaptive_gsc.gsc_postfilter_fused) re-reads and
re-writes the whole adaptive state (RLS precision triangle, active weights,
CSD accumulators — ~10x the frame data) from HBM every frame; at bench
shapes the scan is state-traffic/launch bound.  This kernel keeps the state
RESIDENT IN VMEM scratch across the entire utterance: the grid iterates
(batch blocks x frame tiles) with frames innermost, so per frame only the
packed spectrum block streams in and the packed output streams out.

Same math as `_rls_step_factory` + the fused Zelinski recursion, operand for
operand (verified against the XLA path in tests/test_pallas_fused.py and by
bench.py --selfcheck on device):

  - per-bin RLS gain/precision/active-weight updates with quadratic
    constraint + norm cap (pybeamformer.py:816-898 semantics;
    beamformer.cc:1576-1645 is the C++ twin),
  - reference-channel frame energy + silence gating computed in-step,
  - Zelinski CSD pair/trace EMA and spectral-floor clamp
    (postfilter.cc:57-148).

Lane layout: the packed analysis spectrum ``[Re(0..M/2) | Im(1..M/2-1)]``
splits at lane M/2 into two aligned halves U|V with V = [Re(M/2),
Im(1..M/2-1)]; masking lane 0 of each half yields ALIGNED re/im planes for
bins 0..M/2 on lanes 0..M/2 (DC and Nyquist imaginary parts are
structurally zero), so all 129 bins run one uniform vector program — no
per-bin special cases.  Lanes above M/2 carry zeros through the whole
program (weights are zero there); their precision-state lanes are pinned to
the initial value so nothing grows unboundedly.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SPECTRAL_FLOOR = 1.0e-4  # postfilter.cc SPECTRAL_FLOOR

# Paired (full-lane-occupancy) scan mode — see _make_kernel ``paired``.
# DSR_PAIRED=0 opts out (falls back to the round-4 aligned layout).
PAIRED = os.environ.get("DSR_PAIRED", "1") == "1"
# Independent 16-row pair-groups per grid step in paired mode.  Measured on
# v5e: G=2 is throughput-neutral (166.2 vs 164.9 ms at the bench shape) —
# the kernel is VPU-ISSUE bound (~1.2 cycles/op), so doubling rows AND
# instructions per step cancels; the knob stays for future toolchains whose
# schedulers interleave the independent chains.
ILP_GROUPS = int(os.environ.get("DSR_ILP_GROUPS", "1"))

__all__ = [
    "analysis_fw_synthesis_pallas",
    "analysis_gsc_rls_zelinski_pallas",
    "gsc_rls_zelinski_steered_pallas",
    "analysis_gsc_synthesis_pallas",
    "gsc_rls_zelinski_pallas",
    "zelinski_apply_pallas",
    "pallas_scan_supported",
]


def pallas_scan_supported(M: int, C: int) -> bool:
    """Kernel preconditions: power-of-two M with M/2 a lane multiple."""
    return M >= 256 and M % 256 == 0 and C >= 2


# ---------------------------------------------------------------------------
# tiny complex helpers on (re, im) pairs of f32 tiles
# ---------------------------------------------------------------------------


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cmul_conj(ar, ai, br, bi):
    """(a) * conj(b)"""
    return ar * br + ai * bi, ai * br - ar * bi


def _cdiv(ar, ai, br, bi):
    s = br * br + bi * bi
    s = jnp.where(s > 0, s, 1.0)
    return (ar * br + ai * bi) / s, (ai * br - ar * bi) / s


def _make_kernel(cfg, C: int, Bc: int, K: int, Mh: int, pf_alpha: float,
                 pf_type: int, pf_min_frames: int, analysis=None,
                 synthesis=None, paired: bool = False):
    """cfg: GSCRLSConfig (static python floats).

    ``analysis``: None for the packed-spectrum input kernel, or a dict
    ``{"m", "R", "D", "prec"}`` for the FUSED analysis+scan kernel — the
    polyphase FIR + packed DFT of `ops.pallas_kernels`'s blocked analysis
    body runs at tile start in VMEM, so the [Tf, B, C, M] packed spectrum
    (3.3 GB at bench shapes — the flagship's dominant HBM traffic) never
    exists in HBM.

    ``synthesis``: None to emit packed spectrum frames, or a dict
    ``{"pd"}`` (requires ``analysis``) to ALSO run the synthesis bank's
    DFT matmul + polyphase FIR + overlap-add in the same kernel
    (`ops.pallas_kernels._make_synthesis_tm_kernel` algebra): the scan's
    K output frames are collected in VMEM, multiplied by the packed
    synthesis matrix, and overlap-added against a ring of the previous
    tile's last ``m*R - 1`` DFT frames — so the beamformed spectrum never
    exists in HBM either and ``out_ref`` holds time samples [K, Bb, D].
    Out row ``t*K + l`` is output frame ``t*K + l - pd`` on the synthesis
    stream (``pd`` = FilterbankParams.synthesis_delay); the wrapper crops
    rows [pd, pd + T_out).

    ``paired``: the round-5 full-lane-occupancy mode.  The aligned re/im
    layout above leaves lanes Mh+1..2Mh-1 dead (129 live bins of 2*Mh
    lanes, ~48% wasted VPU work); in paired mode each [8, 2*Mh] vector op
    instead carries TWO 8-row batch groups' bins 0..Mh-1 — group 0 on
    lanes [0, Mh), group 1 on lanes [Mh, 2Mh) — at the SAME instruction
    count, and the grid batch dim covers 16 rows per step.  Bin Mh
    (Nyquist) is excluded and handled by the XLA side pass
    (`_nyquist_sidepass`, exact same recursion via
    adaptive_gsc.gsc_postfilter_fused); bin 0 rides along because its
    weights are exactly real (manifold e^0 = 1; checked by `_paired_ok`),
    so its imaginary lane stays identically zero through the whole
    recursion.  Every vector VALUE stays <= 8 sublanes (16-row operands
    are sliced at the REF level) — the Mosaic vreg slicer faults on
    16-sublane values ("Check failed: limits[i] <= dim(i)", reproduced on
    v5e).  A second `aux` output carries the per-row frame energy and the
    per-channel Nyquist-bin snapshots (lanes 0/Mh and 1+c/Mh+1+c) for the
    side pass."""
    pairs = [(i, j) for i in range(Bc) for j in range(Bc) if i < j]
    pidx = {p: n for n, p in enumerate(pairs)}
    cpairs = [(i, j) for i in range(C) for j in range(C) if i < j]
    real_mode = bool(pf_type & 0x01)
    mu = float(cfg.mu)
    gamma = float(cfg.gamma)
    beta = float(cfg.beta)
    reg = float(cfg.regularization_param)
    sil = float(cfg.sil_thresh)
    alpha2 = float(cfg.alpha2)
    max_wa = float(cfg.max_wa_l2norm)
    d0 = 1.0 / float(cfg.init_diagonal_load)
    e0 = float(cfg.init_diagonal_load)
    copt = int(cfg.constraint_option)
    M = 2 * Mh

    def kernel(*refs):
        """Refs (packed mode):
        x_ref   [K, C, Bb, M]   packed input frames (f32; channel ahead of
                                the batch rows so every read is a contiguous
                                leading-dim slice, never sublane-strided)
        wq_ref  [2, C, Bb, M]     aligned wqH re/im planes (lanes 0..Mh)
        bm_ref  [2, Bc, C, Bb, M] aligned BmH re/im planes
        ta_ref  [2, C, Bb, M]     aligned manifold (ta_) re/im planes
        (weights pre-tiled over the Bb rows host-side)
        out_ref [K, Bb, M]      packed output frames
        scratch: per-(batch-block) VMEM state, persists over the frame grid:
        war/wai [Bc, Bb, M], d [Bc, Bb, M], offr/offi [P, Bb, M],
        en [Bb, M] (full-width, see energy note below), ppr/ppi [Bb, M],
        pd [Bb, M]

        Fused-analysis mode replaces x_ref with (a_ref, b_ref [K, C, Bb, D]
        adjacent block tiles, hw_ref [m*R, D], A_ref [M, M]) — the
        `_make_analysis_tm_blocked_kernel` window/FIR/DFT algebra verbatim
        (laN == m*R - 1 alignment, delay-compensation type 2).
        """
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if analysis is None:
            (x_ref, wq_ref, bm_ref, ta_ref, *rest) = refs
        elif synthesis is None:
            (a_ref, b_ref, hw_ref, A_ref, wq_ref, bm_ref, ta_ref,
             *rest) = refs
        else:
            (a_ref, b_ref, hw_ref, A_ref, S_ref, gf_ref,
             wq_ref, bm_ref, ta_ref, *rest) = refs
        if paired:
            out_ref, aux_ref = rest[0], rest[1]
            (war_s, wai_s, d_s, offr_s, offi_s, en_s, ppr_s, ppi_s, pd_s,
             *tail) = rest[2:]
            if synthesis is not None:
                # [2G, K, 8, M] scan-output tiles / [2G, mR-1, 8, M] OLA
                # rings, one leading slot per (group, half)
                ys_s, cring_s = tail
        else:
            out_ref = rest[0]
            (war_s, wai_s, d_s, offr_s, offi_s, en_s, ppr_s, ppi_s, pd_s,
             *tail) = rest[1:]
            if synthesis is not None:
                ys_s, cring_s = tail

        tt = pl.program_id(1)
        Bb = out_ref.shape[1]
        # vector-op row width: every VALUE in the program is Bv sublanes;
        # paired mode slices the Bb-row block into 8-row groups at the
        # REF level (16-sublane values fault the Mosaic vreg slicer).
        # G_count independent 16-row pair-groups run per frame for ILP.
        Bv = 8 if paired else Bb
        G_count = Bb // 16 if paired else 1
        group_slices = ([slice(g * 16 + hh * 8, g * 16 + hh * 8 + 8)
                         for g in range(G_count) for hh in range(2)]
                        if paired else [slice(0, Bb)])

        if analysis is None:
            def get_P(k, c, gi=None):
                if gi is None:
                    return x_ref[k, c]
                return x_ref[k, c, group_slices[gi]]
        else:
            m_, R_, D_ = analysis["m"], analysis["R"], analysis["D"]
            prec = analysis["prec"]
            mR = m_ * R_
            P_all = []
            for gsl in group_slices:
                wins = jnp.concatenate(
                    [a_ref[:, :, gsl], b_ref[: mR - 1, :, gsl]], axis=0)
                P_g = []
                for c in range(C):
                    acc = None
                    for j in range(R_):
                        w = None
                        for ktap in range(m_):
                            off = (m_ - 1 - ktap) * R_ + j
                            t_ = (hw_ref[j * m_ + ktap, :][None, None, :]
                                  * wins[off : off + K, c])
                            w = t_ if w is None else w + t_
                        term = jax.lax.dot_general(
                            w.reshape(K * Bv, D_),
                            A_ref[j * D_ : (j + 1) * D_, :],
                            (((1,), (0,)), ((), ())),
                            precision=prec,
                            preferred_element_type=jnp.float32,
                        )
                        acc = term if acc is None else acc + term
                    P_g.append(acc.reshape(K, Bv, M))
                P_all.append(P_g)

            def get_P(k, c, gi=None):
                return P_all[gi or 0][c][k]

        lane = jax.lax.broadcasted_iota(jnp.int32, (Bv, M), 1)
        m0 = (lane[:, :Mh] == 0).astype(jnp.float32)  # [Bv, Mh] lane-0 mask
        active = lane <= Mh                           # bins 0..Mh live (bool)
        if paired:
            # lanes 0 and Mh are the two groups' bin-0 slots
            m0p = ((lane == 0) | (lane == Mh)).astype(jnp.float32)

        @pl.when(tt == 0)
        def _init():
            war_s[...] = jnp.zeros(war_s.shape, jnp.float32)
            wai_s[...] = jnp.zeros(wai_s.shape, jnp.float32)
            d_s[...] = jnp.full(d_s.shape, d0, jnp.float32)
            if pairs:
                offr_s[...] = jnp.zeros(offr_s.shape, jnp.float32)
                offi_s[...] = jnp.zeros(offi_s.shape, jnp.float32)
            en_s[...] = jnp.full(en_s.shape, e0, jnp.float32)
            ppr_s[...] = jnp.zeros(ppr_s.shape, jnp.float32)
            ppi_s[...] = jnp.zeros(ppi_s.shape, jnp.float32)
            pd_s[...] = jnp.zeros(pd_s.shape, jnp.float32)
            if synthesis is not None:
                cring_s[...] = jnp.zeros(cring_s.shape, jnp.float32)

        def weight_planes(ref, c, sld=slice(None)):
            # [Bv, M]: pre-tiled host-side (see gsc_rls_zelinski_pallas) so
            # the vector program never carries sublane-replicated operands,
            # which the Mosaic vreg slicer faults on at batch tiles > 8
            return ref[0, c, sld], ref[1, c, sld]

        for k in range(K):
            t = tt * K + k
            # G_count independent 16-row pair-groups per frame: their
            # recursion chains carry no mutual dependencies, so Mosaic's
            # scheduler interleaves them to fill the VPU latency slots the
            # single-chain kernel leaves empty (measured ~2.8 cycles/op
            # at G=1 on v5e -- per-frame dependency-chain bound)
            for gidx in range(G_count):
                sld = (slice(gidx * 8, (gidx + 1) * 8) if paired
                       else slice(None))

                # ---- aligned complex spectrum per channel ----
                Xre, Xim, vcats = [], [], []
                for c in range(C):
                    if paired:
                        # two 8-row groups side by side on the lane axis:
                        # U|U' are bins 0..Mh-1 re, V|V' have Im(1..Mh-1) with
                        # Re(Mh) in the per-group lane-0 slot (masked out of
                        # xim, kept in vcat for energy + the aux output)
                        P0 = get_P(k, c, 2 * gidx)
                        P1 = get_P(k, c, 2 * gidx + 1)
                        xre = jnp.concatenate([P0[:, :Mh], P1[:, :Mh]], axis=-1)
                        vcat = jnp.concatenate([P0[:, Mh:], P1[:, Mh:]], axis=-1)
                        xim = vcat * (1.0 - m0p)
                        vcats.append(vcat)
                    else:
                        P = get_P(k, c)  # [Bb, M]
                        U, V = P[:, :Mh], P[:, Mh:]
                        xre = jnp.concatenate([U, V * m0], axis=-1)
                        xim = jnp.concatenate(
                            [V * (1.0 - m0), jnp.zeros_like(V)], axis=-1)
                    Xre.append(xre)
                    Xim.append(xim)

                # ---- frame energy (channel 0, frame_energy_half) ----
                if paired:
                    # q = |X|^2 incl. the Nyquist bin (xre^2 + xim^2 +
                    # (vcat*m0p)^2 == xre^2 + vcat^2, masks disjoint); the
                    # per-half lane reductions keep the two row groups apart
                    q = Xre[0] * Xre[0] + vcats[0] * vcats[0]
                    q0, q1 = q[:, :Mh], q[:, Mh:]
                    t0 = jnp.sum(q0, axis=-1, keepdims=True)
                    t1 = jnp.sum(q1, axis=-1, keepdims=True)
                    z0 = jnp.sum(q0 * m0, axis=-1, keepdims=True)
                    z1 = jnp.sum(q1 * m0, axis=-1, keepdims=True)
                    en_b = jnp.concatenate([
                        jnp.broadcast_to((2.0 * t0 - z0) / M, (Bv, Mh)),
                        jnp.broadcast_to((2.0 * t1 - z1) / M, (Bv, Mh)),
                    ], axis=-1)
                else:
                    p = Xre[0] * Xre[0] + Xim[0] * Xim[0]  # [Bb, M]
                    tot = jnp.sum(p, axis=-1, keepdims=True)
                    pdc = jnp.sum(
                        p * jnp.concatenate([m0, jnp.zeros_like(m0)], -1),
                        axis=-1, keepdims=True)
                    pny = jnp.sum(
                        p * jnp.concatenate([jnp.zeros_like(m0), m0], -1),
                        axis=-1, keepdims=True)
                    energy_t = (2.0 * tot - pdc - pny) / M  # [Bb, 1]
                    # full-width [Bv, M] immediately: lane-replicated [Bv, 1]
                    # operands stay out of the vector program (and the en
                    # scratch is carried full-width because a [Bv, 1] VMEM ref
                    # crashes this Mosaic toolchain); all lanes hold the same
                    # value
                    en_b = jnp.broadcast_to(energy_t, (Bv, M))
                gate = en_b > en_s[sld] / sil  # [Bb, M] bool; used via SELECTS
                # NOTE every speculative value below (constraint scale, betaK,
                # the whole non-gated update) is folded in with jnp.where
                # SELECTS, never arithmetic blends: a blend like
                # ``gate*new + (1-gate)*old`` turns a speculative inf/NaN on a
                # not-taken lane into NaN state (0*inf = NaN).  That was the
                # round-3 real-speech NaN on v5e: near-silent bins give
                # waK2 ~ 1e-38 on the first adapted frame, max_wa/waK2
                # overflows to inf, and the not-over lanes blended 0*inf.  The
                # XLA twin (adaptive_gsc.py:288-322) always used selects,
                # which is why it was finite on identical inputs.

                # ---- blocking-matrix outputs and quiescent branch ----
                Zr, Zi = [], []
                for b in range(Bc):
                    zr = zi = 0.0
                    for c in range(C):
                        br_ = bm_ref[0, b, c, sld]
                        bi_ = bm_ref[1, b, c, sld]
                        tr, ti = _cmul(br_, bi_, Xre[c], Xim[c])
                        zr = zr + tr
                        zi = zi + ti
                    Zr.append(zr)
                    Zi.append(zi)
                Ycr = Yci = 0.0
                for c in range(C):
                    wr_, wi_ = weight_planes(wq_ref, c, sld)
                    tr, ti = _cmul(wr_, wi_, Xre[c], Xim[c])
                    Ycr = Ycr + tr
                    Yci = Yci + ti

                dlist = [d_s[i, sld] for i in range(Bc)]
                offr = [offr_s[n, sld] for n in range(len(pairs))] if pairs else []
                offi = [offi_s[n, sld] for n in range(len(pairs))] if pairs else []
                war = [war_s[i, sld] for i in range(Bc)]
                wai = [wai_s[i, sld] for i in range(Bc)]

                def pz_matvec(d, orr, oi, vr, vi):
                    """(Pz v)_i with Pz carried as diag + upper triangle."""
                    outr, outi = [], []
                    for i in range(Bc):
                        rr = d[i] * vr[i]
                        ri = d[i] * vi[i]
                        for j in range(i + 1, Bc):
                            n = pidx[(i, j)]
                            tr, ti = _cmul(orr[n], oi[n], vr[j], vi[j])
                            rr = rr + tr
                            ri = ri + ti
                        for j in range(i):
                            n = pidx[(j, i)]
                            tr, ti = _cmul(orr[n], -oi[n], vr[j], vi[j])
                            rr = rr + tr
                            ri = ri + ti
                        outr.append(rr)
                        outi.append(ri)
                    return outr, outi

                PzZr, PzZi = pz_matvec(dlist, offr, offi, Zr, Zi)
                ipr = ipi = 0.0
                for i in range(Bc):
                    tr, ti = _cmul(Zr[i], -Zi[i], PzZr[i], PzZi[i])  # conj(Z)*PzZ
                    ipr = ipr + tr
                    ipi = ipi + ti
                denr, deni = mu + ipr, ipi
                gzr, gzi = [], []
                for i in range(Bc):
                    qr, qi = _cdiv(PzZr[i], PzZi[i], denr, deni)
                    gzr.append(qr)
                    gzi.append(qi)
                # The diagonal update cancels catastrophically in f32 when
                # d |Z|^2 >> mu (gz.PzZ -> d); the true value is
                # d*mu/(mu + d|Z|^2) > 0, so the clamp below only removes
                # rounding artifacts that would break Pz's positive
                # definiteness.
                dK = [jnp.maximum(
                          (dlist[i] - (gzr[i] * PzZr[i] + gzi[i] * PzZi[i])) / mu,
                          0.0)
                      for i in range(Bc)]
                offKr, offKi = [], []
                for n, (i, j) in enumerate(pairs):
                    tr, ti = _cmul_conj(gzr[i], gzi[i], PzZr[j], PzZi[j])
                    offKr.append((offr[n] - tr) / mu)
                    offKi.append((offi[n] - ti) / mu)

                # ---- active weight update ----
                epr, epi = Ycr, Yci
                for i in range(Bc):
                    tr, ti = _cmul(war[i], wai[i], Zr[i], Zi[i])
                    epr = epr - tr
                    epi = epi - ti
                nwr, nwi = [], []
                for i in range(Bc):
                    tr, ti = _cmul(gzr[i], -gzi[i], epr, epi)  # conj(gz)*ep
                    nwr.append(war[i] + gamma * tr)
                    nwi.append(wai[i] + gamma * ti)
                if reg > 0:
                    for i in range(Bc):
                        rr = dK[i] * war[i]
                        ri = dK[i] * wai[i]
                        for j in range(i + 1, Bc):
                            n = pidx[(i, j)]
                            tr, ti = _cmul(offKr[n], -offKi[n], war[j], wai[j])
                            rr = rr + tr
                            ri = ri + ti
                        for j in range(i):
                            n = pidx[(j, i)]
                            tr, ti = _cmul(offKr[n], offKi[n], war[j], wai[j])
                            rr = rr + tr
                            ri = ri + ti
                        nwr[i] = nwr[i] - rr * reg
                        nwi[i] = nwi[i] - ri * reg

                if copt > 0:
                    waK2 = 0.0
                    for i in range(Bc):
                        waK2 = waK2 + nwr[i] * nwr[i] + nwi[i] * nwi[i]
                    if copt in (1, 3):
                        # quadratic constraint on conj(waH) through PzK
                        waKr = [nwr[i] for i in range(Bc)]
                        waKi = [-nwi[i] for i in range(Bc)]
                        var_, vai_ = pz_matvec(dK, offKr, offKi, waKr, waKi)
                        a = 0.0
                        bq = 0.0
                        for i in range(Bc):
                            a = a + var_[i] * var_[i] + vai_[i] * vai_[i]
                            bq = bq - 2.0 * (var_[i] * waKr[i] + vai_[i] * waKi[i])
                        cc = waK2 - alpha2
                        arg = bq * bq - 4.0 * a * cc
                        a_safe = jnp.where(a > 0, a, 1.0)
                        betaK = jnp.where(
                            arg > 0,
                            -(bq + jnp.sqrt(jnp.maximum(arg, 0.0))) / (2.0 * a_safe),
                            -bq / (2.0 * a_safe),
                        )
                        hit = waK2 > alpha2
                        for i in range(Bc):
                            nwr[i] = jnp.where(hit, nwr[i] - betaK * var_[i], nwr[i])
                            nwi[i] = jnp.where(hit, nwi[i] + betaK * vai_[i], nwi[i])
                    if copt >= 2:
                        over = waK2 > max_wa
                        # max(waK2, max_wa) keeps the ratio <= 1 so `scale` is
                        # finite even when waK2 underflows toward 0; on `over`
                        # lanes waK2 > max_wa so this equals the reference's
                        # sqrt(max_wa/waK2) (pybeamformer.py:862-865) exactly.
                        scale = jnp.sqrt(max_wa / jnp.maximum(waK2, max_wa))
                        for i in range(Bc):
                            nwr[i] = jnp.where(over, nwr[i] * scale, nwr[i])
                            nwi[i] = jnp.where(over, nwi[i] * scale, nwi[i])
                            dK[i] = jnp.where(over, d0, dK[i])
                        for n in range(len(pairs)):
                            offKr[n] = jnp.where(over, 0.0, offKr[n])
                            offKi[n] = jnp.where(over, 0.0, offKi[n])

                # ---- silence gate + dead-lane pinning, state write-back ----
                # (selects, not blends — see the NaN note at `gate` above)
                for i in range(Bc):
                    d_new = jnp.where(gate, dK[i], dlist[i])
                    # paired mode has no dead lanes to pin
                    d_s[i, sld] = d_new if paired else jnp.where(active, d_new, d0)
                    war_s[i, sld] = jnp.where(gate, nwr[i], war[i])
                    wai_s[i, sld] = jnp.where(gate, nwi[i], wai[i])
                for n in range(len(pairs)):
                    offr_new = jnp.where(gate, offKr[n], offr[n])
                    offi_new = jnp.where(gate, offKi[n], offi[n])
                    offr_s[n, sld] = offr_new if paired else jnp.where(
                        active, offr_new, 0.0)
                    offi_s[n, sld] = offi_new if paired else jnp.where(
                        active, offi_new, 0.0)
                en_s[sld] = en_s[sld] * beta + (1.0 - beta) * en_b

                # ---- GSC output with gated weights ----
                war2 = [war_s[i, sld] for i in range(Bc)]
                wai2 = [wai_s[i, sld] for i in range(Bc)]
                Yr, Yi = Ycr, Yci
                for i in range(Bc):
                    tr, ti = _cmul(war2[i], wai2[i], Zr[i], Zi[i])
                    Yr = Yr - tr
                    Yi = Yi - ti
                Yr = jnp.where(t >= cfg.min_frames, Yr, Ycr)
                Yi = jnp.where(t >= cfg.min_frames, Yi, Yci)

                # ---- fused Zelinski postfilter ----
                alr, ali = [], []
                for c in range(C):
                    tr_, ti_ = ta_ref[0, c, sld], ta_ref[1, c, sld]
                    ar_, ai_ = _cmul(tr_, -ti_, Xre[c], Xim[c])  # conj(ta) * X
                    alr.append(ar_)
                    ali.append(ai_)
                psr = psi = 0.0
                for i, j in cpairs:
                    tr, ti = _cmul_conj(alr[i], ali[i], alr[j], ali[j])
                    psr = psr + tr
                    psi = psi + ti
                dsum = 0.0
                for c in range(C):
                    dsum = dsum + alr[c] * alr[c] + ali[c] * ali[c]
                # smoothing starts at the reference's THIRD call; apply gate is
                # min_frames+1 (pre-increment frame_no_, postfilter.cc:424-473)
                ppr = jnp.where(t > 1, pf_alpha * ppr_s[sld] + (1.0 - pf_alpha) * psr, psr)
                ppi = jnp.where(t > 1, pf_alpha * ppi_s[sld] + (1.0 - pf_alpha) * psi, psi)
                pd = jnp.where(t > 1, pf_alpha * pd_s[sld] + (1.0 - pf_alpha) * dsum, dsum)
                ppr_s[sld] = ppr
                ppi_s[sld] = ppi
                pd_s[sld] = pd
                if real_mode:
                    num = jnp.maximum(ppr, 0.0)
                else:
                    num = jnp.sqrt(ppr * ppr + ppi * ppi)
                ratio = jnp.where(pd > 0, num / jnp.where(pd > 0, pd, 1.0), 0.0)
                W = jnp.clip(ratio * (2.0 / (C - 1.0)), SPECTRAL_FLOOR, 1.0)
                apply_pf = t > pf_min_frames
                Yr_o = jnp.where(apply_pf, Yr * W, Yr)
                Yi_o = jnp.where(apply_pf, Yi * W, Yi)

                # ---- repack [Re(0..Mh) | Im(1..Mh-1)] ----
                if paired:
                    # per group: [Re(0..Mh-1) | 0, Im(1..Mh-1)] — the Re(Mh)
                    # slot (second-half lane 0) is zero here; bin Mh is merged
                    # by the XLA side pass.  Bin 0's imaginary lane is exactly
                    # zero by the real-DC-weights invariant, so no masking is
                    # needed.  Stores are REF slices (16-sublane values fault).
                    for hh in range(2):
                        lanes = slice(hh * Mh, (hh + 1) * Mh)
                        rows = slice(gidx * 16 + hh * 8, gidx * 16 + hh * 8 + 8)
                        pk = jnp.concatenate(
                            [Yr_o[:, lanes], Yi_o[:, lanes]], axis=-1)
                        if synthesis is None:
                            out_ref[k, rows, :] = pk
                        else:
                            ys_s[2 * gidx + hh, k, :, :] = pk
                    # aux: frame energy at lanes 0/Mh (group 0/1) + per-channel
                    # Nyquist-bin snapshots rolled to lanes 1+c / Mh+1+c
                    aux = en_b * m0p
                    for c in range(C):
                        aux = aux + pltpu.roll(vcats[c] * m0p, 1 + c, axis=1)
                    aux_ref[k, sld, :] = aux
                elif synthesis is None:
                    out_ref[k, :, :] = jnp.concatenate(
                        [Yr_o[:, :Mh],
                         Yi_o[:, :Mh] * (1.0 - m0) + Yr_o[:, Mh:] * m0],
                        axis=-1,
                    )
                else:
                    ys_s[k, :, :] = jnp.concatenate(
                        [Yr_o[:, :Mh],
                         Yi_o[:, :Mh] * (1.0 - m0) + Yr_o[:, Mh:] * m0],
                        axis=-1,
                    )

        if synthesis is not None:
            # ---- in-kernel synthesis bank: DFT matmul + polyphase FIR +
            # overlap-add (_make_synthesis_tm_kernel algebra).  The halo is
            # the RING of the previous tile's last m*R-1 DFT frames: window
            # slot l holds c-stream frame t*K + l - (mR-1), so the out tile
            # [t*K, t*K+K) on the SHIFTED output stream (row u = synthesis
            # out frame u - pd) sees exactly the c frames it needs.
            m_, R_, D_ = analysis["m"], analysis["R"], analysis["D"]
            prec = analysis["prec"]
            mR = m_ * R_
            pdel = synthesis["pd"]
            if paired:
                syn_units = [(ys_s.at[h], cring_s.at[h], group_slices[h])
                             for h in range(2 * G_count)]
            else:
                syn_units = [(ys_s, cring_s, slice(None))]
            for ys_u, cring_u, gsl in syn_units:
                Bu = 8 if paired else ys_u.shape[1]
                c_tile = jax.lax.dot_general(
                    ys_u[...].reshape(K * Bu, M),
                    S_ref[:],
                    (((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32,
                ).reshape(K, Bu, M)
                window = jnp.concatenate([cring_u[...], c_tile], axis=0)
                nS = K + R_ - 1
                s = None
                for kk in range(m_):
                    term = (gf_ref[kk, :][None, None, :]
                            * window[(m_ - 1 - kk) * R_
                                     : (m_ - 1 - kk) * R_ + nS])
                    s = term if s is None else s + term
                # zero rows with negative global OLA index (empty history;
                # only the first tile has any): global s index =
                # (t*K - pd) + u - (R-1)
                u = jax.lax.broadcasted_iota(jnp.int32, (nS, 1, 1), 0)
                s = jnp.where(tt * K - pdel + u - (R_ - 1) < 0, 0.0, s)
                out = None
                for j in range(R_):
                    seg = s[R_ - 1 - j : R_ - 1 - j + K, :,
                            (R_ - 1 - j) * D_ : (R_ - j) * D_]
                    out = seg if out is None else out + seg
                out_ref[:, gsl, :] = out
                cring_u[...] = window[K : K + mR - 1]

    return kernel


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _call(Yp, wq_planes, bm_planes, ta_planes, cfg, pf_alpha, pf_type,
          pf_min_frames, K, Bb, interpret, paired=False, per_row=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tf, C, B, M = Yp.shape
    Mh = M // 2
    Bc = bm_planes.shape[1]
    Bv = Bb // 2 if paired else Bb  # vector-op row width (see _make_kernel)
    assert not per_row or paired, "per-row weights require paired mode"
    if not per_row:
        assert wq_planes.shape == (2, C, Bv, M), wq_planes.shape
    nP = len([(i, j) for i in range(Bc) for j in range(Bc) if i < j])

    nT = -(-Tf // K)
    nB = -(-B // Bb)
    padT, padB = nT * K - Tf, nB * Bb - B
    if padT or padB:
        Yp = jnp.pad(Yp, ((0, padT), (0, 0), (0, padB), (0, 0)))

    kernel = _make_kernel(cfg, C, Bc, K, Mh, pf_alpha, pf_type, pf_min_frames,
                          paired=paired)
    f32 = jnp.float32
    out_specs = [pl.BlockSpec((K, Bb, M), lambda b, t: (t, b, 0))]
    out_shape = [jax.ShapeDtypeStruct((nT * K, nB * Bb, M), f32)]
    if paired:
        out_specs.append(pl.BlockSpec((K, Bv, M), lambda b, t: (t, b, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nT * K, nB * Bv, M), f32))
    if per_row:
        # per-utterance weights: the plane arrays carry nB*Bv rows and the
        # weight BlockSpecs follow the batch grid dim
        w_specs = [
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, b, 0)),
            pl.BlockSpec((2, Bc, C, Bv, M), lambda b, t: (0, 0, 0, b, 0)),
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, b, 0)),
        ]
    else:
        w_specs = [
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((2, Bc, C, Bv, M), lambda b, t: (0, 0, 0, 0, 0)),
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, 0, 0)),
        ]
    res = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, C, Bb, M), lambda b, t: (t, 0, b, 0)),
        ] + w_specs,
        out_specs=out_specs if paired else out_specs[0],
        out_shape=out_shape if paired else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((Bc, Bv, M), f32),  # war
            pltpu.VMEM((Bc, Bv, M), f32),  # wai
            pltpu.VMEM((Bc, Bv, M), f32),  # d
            pltpu.VMEM((max(nP, 1), Bv, M), f32),  # offr
            pltpu.VMEM((max(nP, 1), Bv, M), f32),  # offi
            pltpu.VMEM((Bv, M), f32),      # energy (full-width, see kernel)
            pltpu.VMEM((Bv, M), f32),      # phi_pair re
            pltpu.VMEM((Bv, M), f32),      # phi_pair im
            pltpu.VMEM((Bv, M), f32),      # phi_diag
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(Yp, wq_planes, bm_planes, ta_planes)
    if paired:
        out, aux = res
        return out[:Tf, :B, :], aux[:Tf]
    return res[:Tf, :B, :]


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def _call_fused_analysis(blocks_tm, hw, A, wq_planes, bm_planes, ta_planes_t,
                         cfg, pf_alpha, pf_type, pf_min_frames, K, Bb,
                         interpret, paired=False):
    """Fused analysis+scan pallas_call.  ``blocks_tm``: [n_rows, C, B, D]
    zero-tail-padded D-sample blocks (n_rows >= (nT+1)*K), laN == m*R - 1
    alignment (delay-compensation type 2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.pallas_kernels import _kernel_prec

    wq_p, ta_p = wq_planes, ta_planes_t
    n_rows, C, B, D = blocks_tm.shape
    M = A.shape[0]
    Mh = M // 2
    mR = hw.shape[0]
    R = M // D
    m = mR // R
    Bc = bm_planes.shape[1]
    Bv = Bb // 2 if paired else Bb
    nP = len([(i, j) for i in range(Bc) for j in range(Bc) if i < j])

    nT = n_rows // K - 1
    nB = -(-B // Bb)
    if nB * Bb > B:
        blocks_tm = jnp.pad(blocks_tm, ((0, 0), (0, 0), (0, nB * Bb - B), (0, 0)))

    kernel = _make_kernel(
        cfg, C, Bc, K, Mh, pf_alpha, pf_type, pf_min_frames,
        analysis={"m": m, "R": R, "D": D, "prec": _kernel_prec()},
        paired=paired,
    )
    f32 = jnp.float32
    out_specs = [pl.BlockSpec((K, Bb, M), lambda b, t: (t, b, 0))]
    out_shape = [jax.ShapeDtypeStruct((nT * K, nB * Bb, M), f32)]
    if paired:
        out_specs.append(pl.BlockSpec((K, Bv, M), lambda b, t: (t, b, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nT * K, nB * Bv, M), f32))
    res = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, C, Bb, D), lambda b, t: (t, 0, b, 0)),
            pl.BlockSpec((K, C, Bb, D), lambda b, t: (t + 1, 0, b, 0)),
            pl.BlockSpec((mR, D), lambda b, t: (0, 0)),
            pl.BlockSpec((M, M), lambda b, t: (0, 0)),
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((2, Bc, C, Bv, M), lambda b, t: (0, 0, 0, 0, 0)),
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, 0, 0)),
        ],
        out_specs=out_specs if paired else out_specs[0],
        out_shape=out_shape if paired else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((Bc, Bv, M), f32),  # war
            pltpu.VMEM((Bc, Bv, M), f32),  # wai
            pltpu.VMEM((Bc, Bv, M), f32),  # d
            pltpu.VMEM((max(nP, 1), Bv, M), f32),  # offr
            pltpu.VMEM((max(nP, 1), Bv, M), f32),  # offi
            pltpu.VMEM((Bv, M), f32),      # energy
            pltpu.VMEM((Bv, M), f32),      # phi_pair re
            pltpu.VMEM((Bv, M), f32),      # phi_pair im
            pltpu.VMEM((Bv, M), f32),      # phi_diag
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(blocks_tm, blocks_tm, hw, A, wq_p, bm_planes, ta_p)
    if paired:
        out, aux = res
        return out[:, :B, :], aux
    return res[:, :B, :]


@partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16))
def _call_fused_mono(blocks_tm, hw, A, S, gf, wq_planes, bm_planes,
                     ta_planes_t, cfg, pf_alpha, pf_type, pf_min_frames, K,
                     Bb, pd, interpret, paired=False):
    """Analysis + GSC-RLS/Zelinski scan + synthesis in ONE pallas_call.
    Output: [nT*K, B, D] time-sample rows on the SHIFTED stream (row u =
    synthesis output frame u - pd); the wrapper crops [pd, pd + T_out)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.pallas_kernels import _kernel_prec

    n_rows, C, B, D = blocks_tm.shape
    M = A.shape[0]
    Mh = M // 2
    mR = hw.shape[0]
    R = M // D
    m = mR // R
    Bc = bm_planes.shape[1]
    Bv = Bb // 2 if paired else Bb
    nP = len([(i, j) for i in range(Bc) for j in range(Bc) if i < j])

    nT = n_rows // K - 1
    nB = -(-B // Bb)
    if nB * Bb > B:
        blocks_tm = jnp.pad(blocks_tm, ((0, 0), (0, 0), (0, nB * Bb - B), (0, 0)))

    kernel = _make_kernel(
        cfg, C, Bc, K, Mh, pf_alpha, pf_type, pf_min_frames,
        analysis={"m": m, "R": R, "D": D, "prec": _kernel_prec()},
        synthesis={"pd": pd},
        paired=paired,
    )
    f32 = jnp.float32
    out_specs = [pl.BlockSpec((K, Bb, D), lambda b, t: (t, b, 0))]
    out_shape = [jax.ShapeDtypeStruct((nT * K, nB * Bb, D), f32)]
    scratch = [
        pltpu.VMEM((Bc, Bv, M), f32),  # war
        pltpu.VMEM((Bc, Bv, M), f32),  # wai
        pltpu.VMEM((Bc, Bv, M), f32),  # d
        pltpu.VMEM((max(nP, 1), Bv, M), f32),  # offr
        pltpu.VMEM((max(nP, 1), Bv, M), f32),  # offi
        pltpu.VMEM((Bv, M), f32),      # energy
        pltpu.VMEM((Bv, M), f32),      # phi_pair re
        pltpu.VMEM((Bv, M), f32),      # phi_pair im
        pltpu.VMEM((Bv, M), f32),      # phi_diag
    ]
    if paired:
        out_specs.append(pl.BlockSpec((K, Bv, M), lambda b, t: (t, b, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nT * K, nB * Bv, M), f32))
        G = Bb // 16
        scratch += [
            pltpu.VMEM((2 * G, K, 8, M), f32),       # ys per (group, half)
            pltpu.VMEM((2 * G, mR - 1, 8, M), f32),  # cring per (group, half)
        ]
    else:
        scratch += [
            pltpu.VMEM((K, Bb, M), f32),   # ys: scan output frames (tile)
            pltpu.VMEM((mR - 1, Bb, M), f32),  # cring: OLA halo ring
        ]
    res = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, C, Bb, D), lambda b, t: (t, 0, b, 0)),
            pl.BlockSpec((K, C, Bb, D), lambda b, t: (t + 1, 0, b, 0)),
            pl.BlockSpec((mR, D), lambda b, t: (0, 0)),
            pl.BlockSpec((M, M), lambda b, t: (0, 0)),
            pl.BlockSpec((M, M), lambda b, t: (0, 0)),
            pl.BlockSpec((m, M), lambda b, t: (0, 0)),
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((2, Bc, C, Bv, M), lambda b, t: (0, 0, 0, 0, 0)),
            pl.BlockSpec((2, C, Bv, M), lambda b, t: (0, 0, 0, 0)),
        ],
        out_specs=out_specs if paired else out_specs[0],
        out_shape=out_shape if paired else out_shape[0],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(blocks_tm, blocks_tm, hw, A, S, gf, wq_planes, bm_planes, ta_planes_t)
    if paired:
        out, aux = res
        return out[:, :B, :], aux
    return res[:, :B, :]


def fused_frame_tile(fb) -> int:
    """Smallest frame tile the fused analysis kernels accept for ``fb``:
    the tile must cover the ``m*R - 1``-row window halo (`_fused_prep`
    precondition), rounded up to a sublane-friendly multiple of 8."""
    need = fb.m * fb.R - 1
    return -(-need // 8) * 8


def analysis_gsc_rls_zelinski_pallas(
    x: jax.Array,
    h,
    fb,
    wqH,
    BmH,
    wq_manifold,
    cfg,
    pf_alpha: float = 0.6,
    pf_type: int = 1,
    pf_min_frames: int = 0,
    frame_tile: int = 16,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Analysis + GSC-RLS + Zelinski in ONE kernel over the raw signal.

    ``x``: [B, C, T] float32 samples; ``h``: analysis prototype; ``fb``:
    FilterbankParams with delay_compensation_type 2 (laN == m*R - 1 — the
    block-aligned halo the fused window indexing relies on).  Remaining
    args as `gsc_rls_zelinski_pallas`.  Returns packed [Tf, B, M], equal
    to ``gsc_rls_zelinski_pallas(analysis_tm_fused(x, ...))`` — but the
    packed spectrum never exists in HBM (3.3 GB of write+read saved at
    bench shapes).
    """
    paired = PAIRED and paired_scan_ok(wqH, BmH, wq_manifold)
    blocks_tm, hw, A, wq_t, bm_t, ta_t, K, Bb, n_frames = _fused_prep(
        x, h, fb, wqH, BmH, wq_manifold, frame_tile, batch_tile, interpret,
        paired=paired,
    )
    if paired:
        B, C = x.shape[0], x.shape[1]
        M = fb.M
        out, aux = _call_fused_analysis(
            blocks_tm, hw, A, wq_t, bm_t, ta_t, cfg,
            float(pf_alpha), int(pf_type), int(pf_min_frames), K, Bb,
            interpret, True,
        )
        out = out[:n_frames]
        e, Xn = _decode_aux(aux[:n_frames], B, C, M)
        ys_nyq = _nyquist_sidepass(Xn, e, np.asarray(wqH),
                                   np.moveaxis(np.asarray(BmH), 0, 0),
                                   np.asarray(wq_manifold), cfg,
                                   pf_alpha, pf_type, pf_min_frames)
        return out.at[:, :, M // 2].set(ys_nyq)
    out = _call_fused_analysis(
        blocks_tm, hw, A, wq_t, bm_t, ta_t, cfg,
        float(pf_alpha), int(pf_type), int(pf_min_frames), K, Bb, interpret,
    )
    return out[:n_frames]


def _fused_prep(x, h, fb, wqH, BmH, wq_manifold, frame_tile, batch_tile,
                interpret=False, paired=False):
    """Shared input prep for the fused analysis+scan kernels: zero-history
    front pad to the m*R-1 window alignment, time-major [rows, C, B, D]
    block layout, packed analysis DFT matrix, Bb-tiled weight planes."""
    from ..ops import dft
    from ..ops.filterbank import _pad_to_blocks

    p = fb
    D, M, m, R = p.D, p.M, p.m, p.R
    mR = m * R
    if frame_tile < mR - 1:
        raise ValueError(f"frame_tile must be >= m*R - 1 = {mR - 1}")
    B, C, T = x.shape
    h = jnp.asarray(h, jnp.float32)
    h_rev = h.reshape(m, M)[:, ::-1]
    hw = jnp.stack(
        [h_rev[k, j * D : (j + 1) * D] for j in range(R) for k in range(m)]
    )
    A = jnp.asarray(dft._analysis_matrix_packed(M))

    x = _pad_to_blocks(x.astype(jnp.float32), D)
    n_blocks = x.shape[-1] // D
    n_frames = n_blocks - p.laN + p.analysis_delay
    K = int(frame_tile)
    nT = -(-n_frames // K)
    # front-pad (m*R - 1 - laN) zero-history rows so frame f's window spans
    # padded rows [f, f + m*R - 1] — tile t then reads block tiles t and
    # t+1, the pipelinable two-tile scheme (zero tail supplies the
    # reference's end-of-stream padding, modulated.cc:418-469 protocol)
    front = mR - 1 - p.laN
    need_rows = (nT + 1) * K
    blocks = x.reshape(B, C, n_blocks, D)
    blocks_tm = jnp.transpose(blocks, (2, 1, 0, 3))  # [n_blocks, C, B, D]
    blocks_tm = jnp.pad(
        blocks_tm,
        ((front, max(need_rows - n_blocks - front, 0)), (0, 0), (0, 0), (0, 0)),
    )

    wq = np.asarray(wqH)
    bm = np.asarray(BmH)
    ta = np.asarray(wq_manifold)

    if paired:
        Bbp = 16 * max(1, ILP_GROUPS)
        pr = Bbp // 2
        return (blocks_tm, hw, A, _paired_planes(wq, M, pr),
                _paired_planes(bm, M, pr), _paired_planes(ta, M, pr),
                K, Bbp, n_frames)

    Bb = _safe_bb(batch_tile, B, interpret)

    def tiled(w):
        pl_ = _aligned_planes(w, M)
        pl_ = np.broadcast_to(pl_[..., None, :], pl_.shape[:-1] + (Bb, M))
        return jnp.asarray(np.ascontiguousarray(pl_))

    return (blocks_tm, hw, A, tiled(wq), tiled(bm), tiled(ta), K, Bb,
            n_frames)


def _safe_bb(batch_tile: int, B: int, interpret: bool) -> int:
    """Batch tile: never below one full (8, 128) vreg sublane group on
    hardware — Mosaic's concat/vreg-slice paths fault on sub-8 sublane
    tiles ("result/input offset mismatch on non-concat dimension" at
    Bb=1, reproduced on v5e); the pallas_call wrappers all pad the batch
    to nB*Bb and trim, so a padded tile is just wasted rows for B < 8."""
    bb = min(int(batch_tile), B)
    return bb if interpret else max(bb, 8)


def analysis_gsc_synthesis_pallas(
    x: jax.Array,
    h,
    g,
    fb,
    wqH,
    BmH,
    wq_manifold,
    cfg,
    pf_alpha: float = 0.6,
    pf_type: int = 1,
    pf_min_frames: int = 0,
    frame_tile: int = 16,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """The FULL flagship pipeline in ONE kernel: raw samples -> analysis
    bank -> GSC-RLS + Zelinski adaptive scan -> synthesis bank -> raw
    samples, with neither the input spectrum NOR the beamformed spectrum
    ever touching HBM.  Equal to
    ``synthesis_half_real_tm(analysis_gsc_rls_zelinski_pallas(x, ...), g,
    fb)`` (same packed synthesis matrix / tap order / OLA-history-zeroing
    as `ops.pallas_kernels.synthesis_tm_fused`).

    ``x``: [B, C, T] float32; returns [B, T_out*D] float32 samples with
    ``T_out = n_frames - fb.synthesis_delay``.
    """
    from ..ops import dft

    p = fb
    m, R, M, D = p.m, p.R, p.M, p.D
    if M > dft.MATMUL_MAX_M:
        raise ValueError("fused synthesis requires the DFT-matmul regime")
    if D % 128 != 0 and not interpret:
        raise ValueError("fused synthesis requires D % 128 == 0")
    paired = PAIRED and paired_scan_ok(wqH, BmH, wq_manifold)
    blocks_tm, hw, A, wq_t, bm_t, ta_t, K, Bb, n_frames = _fused_prep(
        x, h, fb, wqH, BmH, wq_manifold, frame_tile, batch_tile, interpret,
        paired=paired,
    )
    pd = p.synthesis_delay
    T_out = n_frames - pd
    if T_out <= 0:
        raise ValueError(f"need more than {pd} subband frames, got {n_frames}")

    perm = list(dft.segment_reversal_perm(M, R))
    S = jnp.asarray(np.asarray(dft._synthesis_half_matrix_packed(M))[:, perm])
    gf = np.asarray(g, np.float32).reshape(m, M)[:, ::-1][:, perm]
    gf = jnp.asarray(gf)

    B, C = x.shape[0], x.shape[1]
    if paired:
        out, aux = _call_fused_mono(
            blocks_tm, hw, A, S, gf, wq_t, bm_t, ta_t, cfg,
            float(pf_alpha), int(pf_type), int(pf_min_frames), K, Bb,
            int(pd), interpret, True,
        )
        e, Xn = _decode_aux(aux[:n_frames], B, C, M)
        ys_nyq = _nyquist_sidepass(Xn, e, np.asarray(wqH),
                                   np.moveaxis(np.asarray(BmH), 0, 0),
                                   np.asarray(wq_manifold), cfg,
                                   pf_alpha, pf_type, pf_min_frames)
        # synthesis is linear: add the Nyquist lane's time contribution
        y = out[pd : pd + T_out] + _synthesis_nyq_tm(ys_nyq, g, fb)
        return jnp.transpose(y, (1, 0, 2)).reshape(B, T_out * D)
    out = _call_fused_mono(
        blocks_tm, hw, A, S, gf, wq_t, bm_t, ta_t, cfg,
        float(pf_alpha), int(pf_type), int(pf_min_frames), K, Bb, int(pd),
        interpret,
    )  # [nT*K, B, D] shifted rows
    y = out[pd : pd + T_out]  # [T_out, B, D]
    return jnp.transpose(y, (1, 0, 2)).reshape(B, T_out * D)


def _aligned_planes(w: np.ndarray, M: int) -> np.ndarray:
    """[F, ...] complex -> [2, ..., M] f32 planes, bin f on lane f (f<=M/2),
    zeros above."""
    F = w.shape[0]
    rest = w.shape[1:]
    out = np.zeros((2,) + rest + (M,), np.float32)
    wm = np.moveaxis(w, 0, -1)  # [..., F]
    out[0, ..., :F] = wm.real
    out[1, ..., :F] = wm.imag
    return out


# ---------------------------------------------------------------------------
# paired (full-lane-occupancy) mode support — see _make_kernel ``paired``
# ---------------------------------------------------------------------------


def paired_scan_ok(wqH, BmH, wq_manifold) -> bool:
    """Paired mode requires exactly-real DC weights (bin 0 rides the main
    kernel as the real special case of the complex recursion; any imaginary
    DC component would leak into the packed Re lanes)."""
    for w in (wqH, BmH, wq_manifold):
        if float(np.max(np.abs(np.imag(np.asarray(w)[0])))) != 0.0:
            return False
    return True


def _paired_planes(w: np.ndarray, M: int, rows: int = 8) -> jax.Array:
    """[F, ...] complex -> [2, ..., rows, M] f32 planes for paired mode:
    bins 0..M/2-1 on lanes [0, M/2), duplicated on lanes [M/2, M) (the two
    row groups see the same weights), pre-tiled over the ``rows`` sublane
    rows (8 per ILP group — the kernel slices 8 at a time)."""
    Mh = M // 2
    wm = np.moveaxis(np.asarray(w)[:Mh], 0, -1)  # [..., Mh]
    half = np.stack([wm.real, wm.imag]).astype(np.float32)  # [2, ..., Mh]
    pl_ = np.concatenate([half, half], axis=-1)  # [2, ..., M]
    pl_ = np.broadcast_to(pl_[..., None, :], pl_.shape[:-1] + (rows, M))
    return jnp.asarray(np.ascontiguousarray(pl_))


def _decode_aux(aux: jax.Array, B: int, C: int, M: int):
    """Kernel aux output [Tf, nB*8, M] -> (energy [Tf, B],
    X_nyquist [Tf, B, C] real).  Lane layout per 8-row group half:
    lane 0 (+Mh) = frame energy, lanes 1+c (+Mh) = channel-c Re(X(M/2))."""
    Mh = M // 2
    Tf, nB8, _ = aux.shape
    nB = nB8 // 8
    a = aux.reshape(Tf, nB, 8, M)

    def both(lane):
        v = jnp.concatenate([a[..., lane], a[..., Mh + lane]], axis=-1)
        return v.reshape(Tf, nB * 16)[:, :B]

    e = both(0)
    Xn = jnp.stack([both(1 + c) for c in range(C)], axis=-1)
    return e, Xn


def _nyquist_sidepass(Xn, e, wqH, BmH, wq_manifold, cfg, pf_alpha, pf_type,
                      pf_min_frames):
    """Exact bin-M/2 GSC-RLS + Zelinski via the XLA twin
    (adaptive_gsc.gsc_postfilter_fused — same recursion, same gates) on the
    per-frame Nyquist snapshots ``Xn [Tf, B, C]`` (real) with the kernel's
    frame energies ``e [Tf, B]``.  ~1/128th of the main kernel's work.
    Returns the real beamformed+postfiltered Nyquist stream [Tf, B]."""
    from .adaptive_gsc import gsc_postfilter_fused

    def _c(w):
        # complex weights as RE/IM f32 jit constants + in-graph lax.complex:
        # complex64 CONSTANTS break the axon backend when the enclosing jit
        # re-traces at a second shape (the constant transfer path is
        # UNIMPLEMENTED there; reproduced by bench.py's selfcheck-then-main
        # double compile)
        w = np.asarray(w)
        return jax.lax.complex(jnp.asarray(w.real, jnp.float32),
                               jnp.asarray(w.imag, jnp.float32))

    Mh_bin = np.asarray(wqH).shape[0] - 1
    X = Xn[:, :, None, :].astype(jnp.complex64)  # [Tf, B, F=1, C]
    Y = gsc_postfilter_fused(
        X, e,
        _c(np.asarray(wqH)[Mh_bin : Mh_bin + 1]),
        _c(np.asarray(BmH)[Mh_bin : Mh_bin + 1]),
        _c(np.asarray(wq_manifold)[Mh_bin : Mh_bin + 1]),
        "rls", cfg, pf_alpha, pf_type, pf_min_frames,
    )
    # the packed layout keeps only the real part of the Nyquist bin
    # (synthesis assumes a real X(M/2)), like the aligned kernel's repack
    return jnp.real(Y[..., 0])


def _synthesis_nyq_tm(ys: jax.Array, g, fb) -> jax.Array:
    """Time-domain contribution of the Nyquist lane through the synthesis
    bank: ``ys [Tf, B]`` (packed lane M/2 values) -> [T_out, B, D] on the
    CROPPED output stream (row v = synthesis output frame v), equal to
    running the fused synthesis on a packed input that is zero everywhere
    but lane M/2.  Synthesis is linear, so the wrapper adds this to the
    main kernel's output.  Same packed S matrix / tap order / first-tile
    zero-history mask as the in-kernel tail (v >= j per OLA segment)."""
    from ..ops import dft

    p = fb
    m, R, M, D = p.m, p.R, p.M, p.D
    Mh = M // 2
    pd = p.synthesis_delay
    Tf, B = ys.shape
    T_out = Tf - pd
    perm = list(dft.segment_reversal_perm(M, R))
    S = np.asarray(dft._synthesis_half_matrix_packed(M))[:, perm]
    gf = np.asarray(g, np.float32).reshape(m, M)[:, ::-1][:, perm]
    kap = gf * S[Mh][None, :]  # [m, M]
    mR = m * R
    yspad = jnp.pad(ys, ((mR, 0), (0, 0)))
    out = None
    for jp in range(R):  # jp = R-1-j: lane segment jp*D..(jp+1)*D
        seg = None
        for kk in range(m):
            shift = pd - (R - 1 - jp) - kk * R
            w = jax.lax.slice_in_dim(yspad, mR + shift, mR + shift + T_out,
                                     axis=0)
            term = (w[:, :, None]
                    * jnp.asarray(kap[kk, jp * D : (jp + 1) * D],
                                  dtype=jnp.float32)[None, None, :])
            seg = term if seg is None else seg + term
        if R - 1 - jp > 0:
            vmask = (jnp.arange(T_out) >= (R - 1 - jp))[:, None, None]
            seg = jnp.where(vmask, seg, 0.0)
        out = seg if out is None else out + seg
    return out


def gsc_rls_zelinski_pallas(
    Yp: jax.Array,
    wqH,
    BmH,
    wq_manifold,
    cfg,
    pf_alpha: float = 0.6,
    pf_type: int = 1,
    pf_min_frames: int = 0,
    frame_tile: int = 16,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused GSC-RLS + Zelinski over packed time-major frames, one kernel.

    ``Yp``: packed real analysis output [Tf, B, C, M]
    (`ops.filterbank.analysis_half_real_tm(packed=True)` /
    `ops.pallas_kernels.analysis_tm_fused` layout).  ``wqH/BmH`` [F, C] /
    [F, Bc, C] complex; ``wq_manifold`` [F, C] complex (the C++ ta_).
    ``cfg``: adaptive_gsc.GSCRLSConfig.  Returns packed [Tf, B, M], equal to
    `adaptive_gsc.gsc_postfilter_fused(real_packed=True)` with energy=None.

    Tile defaults: VECTOR-OP row width MUST stay <= 8 on the current Mosaic
    toolchain — the vreg slicer faults on values needing more than one
    f32 sublane tile ("Check failed: limits[i] <= dim(i)", reproduced at 16
    with fully pre-tiled operands); 8 rows is exactly one (8, 128) vreg
    sublane group, verified on device.  The default PAIRED mode (see
    `_make_kernel`) instead fills the lane axis: 16 rows per grid step as
    two 8-row groups side by side, with bin M/2 handled by the exact XLA
    side pass — ~2x fewer dead-lane ops at the same op shapes.
    ``frame_tile=16`` amortizes grid overhead; 32 sends Mosaic compile
    time super-linear for ~no gain.
    """
    Tf, B, C, M = Yp.shape
    Mh = M // 2
    wq = np.asarray(wqH)
    bm = np.moveaxis(np.asarray(BmH), 0, 0)  # [F, Bc, C]
    ta = np.asarray(wq_manifold)
    paired = PAIRED and paired_scan_ok(wq, bm, ta)
    Ypt = jnp.moveaxis(Yp, 2, 1)  # [Tf, C, B, M]: see x_ref layout note
    if paired:
        Bbp = 16 * max(1, ILP_GROUPS)
        pr = Bbp // 2
        out, aux = _call(
            Ypt, _paired_planes(wq, M, pr), _paired_planes(bm, M, pr),
            _paired_planes(ta, M, pr), cfg, float(pf_alpha), int(pf_type),
            int(pf_min_frames), int(frame_tile), Bbp, interpret, True,
        )
        e, _ = _decode_aux(aux, B, C, M)
        # Nyquist snapshots come straight from the packed input lanes
        ys_nyq = _nyquist_sidepass(Yp[:, :, :, Mh], e, wq, bm, ta, cfg,
                                   pf_alpha, pf_type, pf_min_frames)
        return out.at[:, :, Mh].set(ys_nyq)
    Bb = _safe_bb(batch_tile, B, interpret)
    # weight planes pre-tiled to the batch block: [2, ..., Bb, M].  Keeping
    # them single-row and broadcasting inside the kernel leaves
    # sublane-REPLICATED operands in the vector program, and the Mosaic
    # vreg slicer faults on them at batch tiles > 8 ("Check failed:
    # limits[i] <= dim(i) (8 vs. 1)"); materializing the Bb rows host-side
    # sidesteps the relayout entirely for ~2.5 MB of VMEM.
    def tiled(w):
        p = _aligned_planes(w, M)  # [2, ..., M]
        p = np.broadcast_to(p[..., None, :], p.shape[:-1] + (Bb, M))
        return jnp.asarray(np.ascontiguousarray(p))

    wq_planes = tiled(wq)          # [2, C, Bb, M]
    bm_planes = tiled(bm)          # [2, Bc, C, Bb, M]
    ta_planes = tiled(ta)          # [2, C, Bb, M]
    return _call(
        Ypt, wq_planes, bm_planes, ta_planes, cfg, float(pf_alpha),
        int(pf_type), int(pf_min_frames), int(frame_tile), Bb, interpret
    )


def _paired_planes_traced(w: jax.Array, M: int) -> jax.Array:
    """Traced (per-utterance) weights -> paired planes.

    ``w [B, F, ...]`` complex with B a multiple of 16 -> ``[2, ...,
    B//2, M]`` f32 planes where plane row ``8*b + i`` carries utterance
    ``16*b + i``'s bins 0..M/2-1 on lanes [0, M/2) and utterance
    ``16*b + 8 + i``'s on lanes [M/2, M) — the per-row-weights layout of
    the steered pipeline (every batch row has its own DOA steering)."""
    Mh = M // 2
    B = w.shape[0]
    nB = B // 16
    wm = jnp.moveaxis(w[:, :Mh], 1, -1)  # [B, rest..., Mh]
    pl = jnp.stack([jnp.real(wm), jnp.imag(wm)])  # [2, B, rest..., Mh]
    nrest = pl.ndim - 3
    pl = pl.reshape((2, nB, 2, 8) + pl.shape[2:])  # [2, nB, g, 8, rest, Mh]
    perm = (0,) + tuple(range(4, 4 + nrest)) + (1, 3, 2, 4 + nrest)
    pl = jnp.transpose(pl, perm)  # [2, rest..., nB, 8, g, Mh]
    return pl.reshape((2,) + pl.shape[1:1 + nrest] + (nB * 8, M)
                      ).astype(jnp.float32)


def _nyquist_sidepass_perrow(Xn, e, wq_b, bm_b, ta_b, cfg, pf_alpha, pf_type,
                             pf_min_frames):
    """`_nyquist_sidepass` with per-utterance (traced) weights: vmap the
    XLA twin over the batch.  ``Xn [Tf, B, C]``, ``e [Tf, B]``, weights
    ``[B, ...]`` at the Nyquist bin."""
    from .adaptive_gsc import gsc_postfilter_fused

    def one(Xb, eb, wqb, bmb, tab):
        Y = gsc_postfilter_fused(
            Xb[:, None, :].astype(jnp.complex64), eb,
            wqb[None], bmb[None], tab[None],
            "rls", cfg, pf_alpha, pf_type, pf_min_frames,
        )
        return jnp.real(Y[..., 0])

    return jax.vmap(one, in_axes=(1, 1, 0, 0, 0), out_axes=1)(
        Xn, e, wq_b, bm_b, ta_b)


def gsc_rls_zelinski_steered_pallas(
    Yp: jax.Array,
    wq_b: jax.Array,
    bm_b: jax.Array,
    ta_b: jax.Array,
    cfg,
    pf_alpha: float = 0.6,
    pf_type: int = 1,
    pf_min_frames: int = 0,
    frame_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """`gsc_rls_zelinski_pallas` with PER-UTTERANCE traced weights — the
    steered pipeline's case (each batch row beamforms at its own estimated
    DOA, models/steered.py).  Paired mode only: the weight planes vary
    along the batch-block axis, so the kernel's weight BlockSpecs index
    the batch grid dim instead of broadcasting.  DC weights are exactly
    real by construction for manifold-derived steering
    (`beamforming.array_manifold` at bin 0 is exp(0)=1 and
    `blocking_matrix` is elementwise Gram-Schmidt, which propagates exact
    zero imaginaries), so `paired_scan_ok` holds analytically.

    ``Yp`` [Tf, B, C, M] packed; ``wq_b/ta_b`` [B, F, C]; ``bm_b``
    [B, F, Bc, C].  Returns packed [Tf, B, M].
    """
    Tf, B, C, M = Yp.shape
    Mh = M // 2
    Bbp = 16 * max(1, ILP_GROUPS)
    Bpad = -(-B // Bbp) * Bbp
    if Bpad > B:
        padw = ((0, Bpad - B),) + ((0, 0),) * 3
        wq_p = jnp.pad(wq_b, padw[:3], mode="edge")
        ta_p = jnp.pad(ta_b, padw[:3], mode="edge")
        bm_p = jnp.pad(bm_b, padw, mode="edge")
    else:
        wq_p, ta_p, bm_p = wq_b, ta_b, bm_b
    planes_wq = _paired_planes_traced(wq_p, M)
    planes_bm = _paired_planes_traced(bm_p, M)
    planes_ta = _paired_planes_traced(ta_p, M)
    Ypt = jnp.moveaxis(Yp, 2, 1)
    out, aux = _call(
        Ypt, planes_wq, planes_bm, planes_ta, cfg, float(pf_alpha),
        int(pf_type), int(pf_min_frames), int(frame_tile), Bbp, interpret,
        True, True,
    )
    e, _ = _decode_aux(aux, B, C, M)
    ys_nyq = _nyquist_sidepass_perrow(
        Yp[:, :, :, Mh], e, wq_b[:, Mh], bm_b[:, Mh], ta_b[:, Mh],
        cfg, pf_alpha, pf_type, pf_min_frames)
    return out.at[:, :, Mh].set(ys_nyq)


# ---------------------------------------------------------------------------
# fixed-weight beamformer + Zelinski postfilter (no adaptive state)
# ---------------------------------------------------------------------------


def _make_fw_kernel(C: int, K: int, Mh: int, pf_alpha: float, pf_type: int,
                    pf_min_frames: int, analysis=None, synthesis=None):
    """Fixed-weight variant of `_make_kernel`: apply ``Y = wq^H X`` and the
    fused Zelinski recursion; only the CSD accumulators live in VMEM.  Used
    by the D&S / SD-MVDR / LCMV pipelines, whose postfilter EMA scan is the
    launch-bound stage on TPU (VERDICT r2 weakness: the coherence
    postfilters ran as a separate sequential CSD scan).

    ``analysis``/``synthesis``: same dicts as `_make_kernel` — with both
    set, this is the fixed-weight MONO kernel (raw samples -> analysis ->
    ``wq^H X`` -> Zelinski -> synthesis in ONE pallas_call; round-5,
    VERDICT r4 #6): strictly simpler than the adaptive mono kernel (no
    recursion chain, ~4x fewer per-frame ops), so the BASELINE config-1/2
    chains run faster than the flagship."""
    cpairs = [(i, j) for i in range(C) for j in range(C) if i < j]
    real_mode = bool(pf_type & 0x01)
    M = 2 * Mh

    def kernel(*refs):
        from jax.experimental import pallas as pl

        if analysis is None:
            (x_ref, wq_ref, ta_ref, out_ref, ppr_s, ppi_s, pd_s) = refs
        else:
            (a_ref, b_ref, hw_ref, A_ref, S_ref, gf_ref, wq_ref, ta_ref,
             out_ref, ppr_s, ppi_s, pd_s, ys_s, cring_s) = refs

        tt = pl.program_id(1)
        Bb = out_ref.shape[1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, M), 1)
        m0 = (lane[:, :Mh] == 0).astype(jnp.float32)

        if analysis is not None:
            m_, R_, D_ = analysis["m"], analysis["R"], analysis["D"]
            prec = analysis["prec"]
            mR = m_ * R_
            win = jnp.concatenate([a_ref[:], b_ref[: mR - 1]], axis=0)
            P_all = []
            for c in range(C):
                acc = None
                for j in range(R_):
                    w = None
                    for ktap in range(m_):
                        off = (m_ - 1 - ktap) * R_ + j
                        t_ = (hw_ref[j * m_ + ktap, :][None, None, :]
                              * win[off : off + K, c])
                        w = t_ if w is None else w + t_
                    term = jax.lax.dot_general(
                        w.reshape(K * Bb, D_),
                        A_ref[j * D_ : (j + 1) * D_, :],
                        (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32,
                    )
                    acc = term if acc is None else acc + term
                P_all.append(acc.reshape(K, Bb, M))

        @pl.when(tt == 0)
        def _init():
            ppr_s[...] = jnp.zeros(ppr_s.shape, jnp.float32)
            ppi_s[...] = jnp.zeros(ppi_s.shape, jnp.float32)
            pd_s[...] = jnp.zeros(pd_s.shape, jnp.float32)
            if synthesis is not None:
                cring_s[...] = jnp.zeros(cring_s.shape, jnp.float32)

        for k in range(K):
            t = tt * K + k

            Xre, Xim = [], []
            for c in range(C):
                P = P_all[c][k] if analysis is not None else x_ref[k, c]
                U, V = P[:, :Mh], P[:, Mh:]
                Xre.append(jnp.concatenate([U, V * m0], axis=-1))
                Xim.append(jnp.concatenate([V * (1.0 - m0), jnp.zeros_like(V)], axis=-1))

            Yr = Yi = 0.0
            for c in range(C):
                wr_, wi_ = wq_ref[0, c], wq_ref[1, c]
                tr, ti = _cmul(wr_, wi_, Xre[c], Xim[c])
                Yr = Yr + tr
                Yi = Yi + ti

            alr, ali = [], []
            for c in range(C):
                tr_, ti_ = ta_ref[0, c], ta_ref[1, c]
                ar_, ai_ = _cmul(tr_, -ti_, Xre[c], Xim[c])  # conj(ta) * X
                alr.append(ar_)
                ali.append(ai_)
            psr = psi = 0.0
            for i, j in cpairs:
                tr, ti = _cmul_conj(alr[i], ali[i], alr[j], ali[j])
                psr = psr + tr
                psi = psi + ti
            dsum = 0.0
            for c in range(C):
                dsum = dsum + alr[c] * alr[c] + ali[c] * ali[c]
            # smoothing from the reference's THIRD call; apply from
            # min_frames+1 (pre-increment frame_no_, postfilter.cc:424-473)
            ppr = jnp.where(t > 1, pf_alpha * ppr_s[...] + (1.0 - pf_alpha) * psr, psr)
            ppi = jnp.where(t > 1, pf_alpha * ppi_s[...] + (1.0 - pf_alpha) * psi, psi)
            pd = jnp.where(t > 1, pf_alpha * pd_s[...] + (1.0 - pf_alpha) * dsum, dsum)
            ppr_s[...] = ppr
            ppi_s[...] = ppi
            pd_s[...] = pd
            if real_mode:
                num = jnp.maximum(ppr, 0.0)
            else:
                num = jnp.sqrt(ppr * ppr + ppi * ppi)
            ratio = jnp.where(pd > 0, num / jnp.where(pd > 0, pd, 1.0), 0.0)
            W = jnp.clip(ratio * (2.0 / (C - 1.0)), SPECTRAL_FLOOR, 1.0)
            apply_pf = t > pf_min_frames
            Yr_o = jnp.where(apply_pf, Yr * W, Yr)
            Yi_o = jnp.where(apply_pf, Yi * W, Yi)

            packed = jnp.concatenate(
                [Yr_o[:, :Mh], Yi_o[:, :Mh] * (1.0 - m0) + Yr_o[:, Mh:] * m0],
                axis=-1,
            )
            if synthesis is None:
                out_ref[k, :, :] = packed
            else:
                ys_s[k, :, :] = packed

        if synthesis is not None:
            # synthesis bank tail — identical algebra to `_make_kernel`'s
            # (DFT matmul + polyphase FIR + OLA against the cring halo)
            pdel = synthesis["pd"]
            c_tile = jax.lax.dot_general(
                ys_s[...].reshape(K * Bb, M),
                S_ref[:],
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            ).reshape(K, Bb, M)
            window = jnp.concatenate([cring_s[...], c_tile], axis=0)
            nS = K + R_ - 1
            s = None
            for kk in range(m_):
                term = (gf_ref[kk, :][None, None, :]
                        * window[(m_ - 1 - kk) * R_
                                 : (m_ - 1 - kk) * R_ + nS])
                s = term if s is None else s + term
            u = jax.lax.broadcasted_iota(jnp.int32, (nS, 1, 1), 0)
            s = jnp.where(tt * K - pdel + u - (R_ - 1) < 0, 0.0, s)
            out = None
            for j in range(R_):
                seg = s[R_ - 1 - j : R_ - 1 - j + K, :,
                        (R_ - 1 - j) * D_ : (R_ - j) * D_]
                out = seg if out is None else out + seg
            out_ref[:] = out
            cring_s[...] = window[K : K + mR - 1]

    return kernel


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def _call_fw(Yp, wq_planes, ta_planes, pf_alpha, pf_type, pf_min_frames, K,
             Bb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tf, C, B, M = Yp.shape
    Mh = M // 2

    nT = -(-Tf // K)
    nB = -(-B // Bb)
    padT, padB = nT * K - Tf, nB * Bb - B
    if padT or padB:
        Yp = jnp.pad(Yp, ((0, padT), (0, 0), (0, padB), (0, 0)))

    kernel = _make_fw_kernel(C, K, Mh, pf_alpha, pf_type, pf_min_frames)
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, C, Bb, M), lambda b, t: (t, 0, b, 0)),
            pl.BlockSpec((2, C, Bb, M), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((2, C, Bb, M), lambda b, t: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, Bb, M), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((nT * K, nB * Bb, M), f32),
        scratch_shapes=[
            pltpu.VMEM((Bb, M), f32),  # phi_pair re
            pltpu.VMEM((Bb, M), f32),  # phi_pair im
            pltpu.VMEM((Bb, M), f32),  # phi_diag
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(Yp, wq_planes, ta_planes)
    return out[:Tf, :B, :]


def zelinski_apply_pallas(
    Yp: jax.Array,
    wqH,
    wq_manifold,
    pf_alpha: float = 0.6,
    pf_type: int = 1,
    pf_min_frames: int = 0,
    frame_tile: int = 16,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fixed-weight beamformer + Zelinski in one kernel over packed
    time-major frames (the fixed-weight sibling of
    `gsc_rls_zelinski_pallas`; same lane layout and tile constraints).

    ``Yp``: packed [Tf, B, C, M]; ``wqH`` [F, C] conjugate apply weights;
    ``wq_manifold`` [F, C] (the C++ ta_).  Returns packed [Tf, B, M].
    """
    Tf, B, C, M = Yp.shape
    Yp = jnp.moveaxis(Yp, 2, 1)  # [Tf, C, B, M]
    Bb = _safe_bb(batch_tile, B, interpret)

    def tiled(w):
        p = _aligned_planes(np.asarray(w), M)
        p = np.broadcast_to(p[..., None, :], p.shape[:-1] + (Bb, M))
        return jnp.asarray(np.ascontiguousarray(p))

    return _call_fw(
        Yp, tiled(wqH), tiled(wq_manifold), float(pf_alpha), int(pf_type),
        int(pf_min_frames), int(frame_tile), Bb, interpret
    )


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13))
def _call_fw_mono(blocks_tm, hw, A, S, gf, wq_planes, ta_planes, pf_alpha,
                  pf_type, pf_min_frames, K, Bb, pd, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.pallas_kernels import _kernel_prec

    n_rows, C, B, D = blocks_tm.shape
    M = A.shape[0]
    Mh = M // 2
    mR = hw.shape[0]
    R = M // D
    m = mR // R

    nT = n_rows // K - 1
    nB = -(-B // Bb)
    if nB * Bb > B:
        blocks_tm = jnp.pad(
            blocks_tm, ((0, 0), (0, 0), (0, nB * Bb - B), (0, 0)))

    kernel = _make_fw_kernel(
        C, K, Mh, pf_alpha, pf_type, pf_min_frames,
        analysis={"m": m, "R": R, "D": D, "prec": _kernel_prec()},
        synthesis={"pd": pd},
    )
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, C, Bb, D), lambda b, t: (t, 0, b, 0)),
            pl.BlockSpec((K, C, Bb, D), lambda b, t: (t + 1, 0, b, 0)),
            pl.BlockSpec((mR, D), lambda b, t: (0, 0)),
            pl.BlockSpec((M, M), lambda b, t: (0, 0)),
            pl.BlockSpec((M, M), lambda b, t: (0, 0)),
            pl.BlockSpec((m, M), lambda b, t: (0, 0)),
            pl.BlockSpec((2, C, Bb, M), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((2, C, Bb, M), lambda b, t: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, Bb, D), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((nT * K, nB * Bb, D), f32),
        scratch_shapes=[
            pltpu.VMEM((Bb, M), f32),          # phi_pair re
            pltpu.VMEM((Bb, M), f32),          # phi_pair im
            pltpu.VMEM((Bb, M), f32),          # phi_diag
            pltpu.VMEM((K, Bb, M), f32),       # ys
            pltpu.VMEM((mR - 1, Bb, M), f32),  # cring
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(blocks_tm, blocks_tm, hw, A, S, gf, wq_planes, ta_planes)
    return out[:, :B, :]


def analysis_fw_synthesis_pallas(
    x: jax.Array,
    h,
    g,
    fb,
    wqH,
    wq_manifold,
    pf_alpha: float = 0.6,
    pf_type: int = 1,
    pf_min_frames: int = 0,
    frame_tile: int = 16,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fixed-weight MONO kernel: raw samples -> analysis bank ->
    ``Y = wq^H X`` -> Zelinski -> synthesis bank in ONE pallas_call — the
    BASELINE config-1/2 pipelines (D&S / SD-MVDR + Zelinski,
    beamformer.cc:1095-1157,2350-2509 + postfilter.cc:57-148) with neither
    spectrum ever in HBM.  Equal to
    ``synthesis_tm_fused(zelinski_apply_pallas(analysis_tm_fused(x)))``.

    ``x`` [B, C, T]; returns [B, T_out*D]."""
    from ..ops import dft

    p = fb
    m, R, M, D = p.m, p.R, p.M, p.D
    if M > dft.MATMUL_MAX_M:
        raise ValueError("fused synthesis requires the DFT-matmul regime")
    if D % 128 != 0 and not interpret:
        raise ValueError("fused synthesis requires D % 128 == 0")
    C = x.shape[1]
    bm_dummy = np.zeros((M // 2 + 1, 1, C), np.complex64)
    blocks_tm, hw, A, wq_t, _, ta_t, K, Bb, n_frames = _fused_prep(
        x, h, fb, wqH, bm_dummy, wq_manifold, frame_tile, batch_tile,
        interpret, paired=False,
    )
    pd = p.synthesis_delay
    T_out = n_frames - pd
    if T_out <= 0:
        raise ValueError(f"need more than {pd} subband frames, got {n_frames}")
    perm = list(dft.segment_reversal_perm(M, R))
    S = jnp.asarray(np.asarray(dft._synthesis_half_matrix_packed(M))[:, perm])
    gf = jnp.asarray(
        np.asarray(g, np.float32).reshape(m, M)[:, ::-1][:, perm])
    out = _call_fw_mono(
        blocks_tm, hw, A, S, gf, wq_t, ta_t, float(pf_alpha), int(pf_type),
        int(pf_min_frames), K, Bb, int(pd), interpret,
    )
    y = out[pd : pd + T_out]
    return jnp.transpose(y, (1, 0, 2)).reshape(x.shape[0], T_out * D)
