"""Pallas TPU scan kernels for the scalar AEC recursions (config 4).

The XLA `lax.scan` NLMS/Kalman cancellers (models/aec.py nlms_aec /
kalman_aec) re-read and re-write their per-bin state from HBM on each of the
~1250 frame steps and are launch-bound (~90 ms of the config-4 chain at
bench shapes).  These kernels keep the state resident in VMEM across the
whole utterance — the models/pallas_fused_scan.py pattern: grid
(batch-blocks x frame-tiles) with frames innermost, packed
``[Re(0..M/2) | Im(1..M/2-1)]`` lanes split into aligned re/im planes via
the lane-0 mask trick — and consume/produce the packed time-major layout
directly, so the complex unpack/repack around the XLA path disappears too.

Recursions (reference-identical, golden-tested through models/aec.py):
  nlms   E = A - R V;  R -= eps |V|^2/(delta+|A|^2) (R - A/V)  if |V|^2>thr
         (NLMSAcousticEchoCancellationFeature, aec.cc:41-81)
  kalman scalar Kalman per bin with smoothed observation noise
         (KalmanFilterEchoCancellationFeature, aec.cc:118-164)

All speculative values (the A/V quotient on near-zero V) are folded in with
jnp.where SELECTS, never arithmetic blends — the fused-scan NaN lesson.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["aec_scan_pallas", "pallas_aec_supported"]


def pallas_aec_supported(kind: str, M: int) -> bool:
    return kind in ("nlms", "kalman") and M >= 256 and M % 256 == 0


def _make_kernel(kind: str, C: int, K: int, Mh: int, p1: float, p2: float,
                 threshold: float):
    """p1/p2: delta/epsilon (nlms) or beta/sigma2 (kalman)."""
    M = 2 * Mh

    def kernel(a_ref, v_ref, out_ref, rr_s, ri_s, sv_s, kk_s):
        """a_ref [K, C, Bb, M] packed mic frames; v_ref [K, Bb, M] packed
        far-end frames; out [K, C, Bb, M] packed echo-cancelled frames.
        State scratch (per batch block, persists over the frame grid):
        rr/ri [C, Bb, M] filter; sv/kk [C, Bb, M] (kalman only)."""
        from jax.experimental import pallas as pl

        tt = pl.program_id(1)
        Bb = v_ref.shape[1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, M), 1)
        m0 = (lane[:, :Mh] == 0).astype(jnp.float32)

        @pl.when(tt == 0)
        def _init():
            rr_s[...] = jnp.zeros(rr_s.shape, jnp.float32)
            ri_s[...] = jnp.zeros(ri_s.shape, jnp.float32)
            if kind == "kalman":
                sv_s[...] = jnp.full(sv_s.shape, p2, jnp.float32)
                kk_s[...] = jnp.full(kk_s.shape, p2, jnp.float32)

        def unpack(P):
            U, V = P[:, :Mh], P[:, Mh:]
            re = jnp.concatenate([U, V * m0], axis=-1)
            im = jnp.concatenate([V * (1.0 - m0), jnp.zeros_like(V)], axis=-1)
            return re, im

        for k in range(K):
            Vr, Vi = unpack(v_ref[k])
            v2 = Vr * Vr + Vi * Vi
            gate = v2 > threshold
            for c in range(C):
                Ar, Ai = unpack(a_ref[k, c])
                Rr, Ri = rr_s[c], ri_s[c]
                Er = Ar - (Rr * Vr - Ri * Vi)
                Ei = Ai - (Rr * Vi + Ri * Vr)
                if kind == "nlms":
                    # Gkhat = A / V (guarded); R step toward it
                    den = jnp.where(v2 > 0, v2, 1.0)
                    Gr = (Ar * Vr + Ai * Vi) / den
                    Gi = (Ai * Vr - Ar * Vi) / den
                    a2 = Ar * Ar + Ai * Ai
                    mu = p2 * v2 / (p1 + a2)
                    rr_s[c] = jnp.where(gate, Rr - (Rr - Gr) * mu, Rr)
                    ri_s[c] = jnp.where(gate, Ri - (Ri - Gi) * mu, Ri)
                else:  # kalman
                    e2 = Er * Er + Ei * Ei
                    sv = p1 * sv_s[c] + (1.0 - p1) * e2
                    kp = kk_s[c] + p2
                    ss = v2 * kp + sv
                    gk = kp / ss
                    rr_s[c] = jnp.where(gate, Rr + (Vr * Er + Vi * Ei) * gk, Rr)
                    ri_s[c] = jnp.where(gate, Ri + (Vr * Ei - Vi * Er) * gk, Ri)
                    sv_s[c] = jnp.where(gate, sv, sv_s[c])
                    kk_s[c] = jnp.where(gate, (1.0 - kp * v2 / ss) * kp, kk_s[c])
                out_ref[k, c] = jnp.concatenate(
                    [Er[:, :Mh], Ei[:, :Mh] * (1.0 - m0) + Er[:, Mh:] * m0],
                    axis=-1,
                )

    return kernel


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _call(Ap, Vp, kind, p1, p2, threshold, K, Bb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tf, C, B, M = Ap.shape
    Mh = M // 2
    nT = -(-Tf // K)
    nB = -(-B // Bb)
    padT, padB = nT * K - Tf, nB * Bb - B
    if padT or padB:
        Ap = jnp.pad(Ap, ((0, padT), (0, 0), (0, padB), (0, 0)))
        Vp = jnp.pad(Vp, ((0, padT), (0, padB), (0, 0)))

    kernel = _make_kernel(kind, C, K, Mh, p1, p2, threshold)
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((K, C, Bb, M), lambda b, t: (t, 0, b, 0)),
            pl.BlockSpec((K, Bb, M), lambda b, t: (t, b, 0)),
        ],
        out_specs=pl.BlockSpec((K, C, Bb, M), lambda b, t: (t, 0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((nT * K, C, nB * Bb, M), f32),
        scratch_shapes=[
            pltpu.VMEM((C, Bb, M), f32),  # R re
            pltpu.VMEM((C, Bb, M), f32),  # R im
            pltpu.VMEM((C, Bb, M), f32),  # sigma2_v (kalman)
            pltpu.VMEM((C, Bb, M), f32),  # K_k (kalman)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(Ap, Vp)
    return out[:Tf, :, :B, :]


def aec_scan_pallas(
    Arec: jax.Array,
    Vplay: jax.Array,
    kind: str = "nlms",
    p1: float = 100.0,
    p2: float = 1.0e-4,
    threshold: float = 100.0,
    frame_tile: int = 16,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Echo-cancel packed time-major frames with VMEM-resident state.

    ``Arec``: packed mic frames [Tf, B, C, M]; ``Vplay``: packed far-end
    frames [Tf, B, 1, M] or [Tf, B, M] (one reference cancels every
    channel).  ``p1/p2``: delta/epsilon for ``kind='nlms'``, beta/sigma2
    for ``kind='kalman'``.  Returns packed [Tf, B, C, M] — equal to the
    models/aec.py scans on the unpacked complex spectra.
    """
    if Vplay.ndim == 4:
        Vplay = Vplay[:, :, 0, :]
    Tf, B, C, M = Arec.shape
    Ap = jnp.moveaxis(Arec, 2, 1)  # [Tf, C, B, M]
    Bb = min(batch_tile, B)
    out = _call(Ap, Vplay, kind, float(p1), float(p2), float(threshold),
                int(frame_tile), Bb, interpret)
    return jnp.moveaxis(out, 1, 2)
