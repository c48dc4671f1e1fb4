"""SRP-PHAT-steered adaptive beamforming, fully in-graph.

BASELINE config 5: per utterance, localize the source by SRP-PHAT over a
steering grid, steer a GSC at the estimated direction, and enhance — the
batched equivalent of chaining DOAEstimatorSRPDSBLA (beamformer.cc:2879-3211)
into SubbandGSCRLS steering (set_look_direction -> calc_gsc_weights).

Unlike ``build_pipeline`` (weights fixed at build time), the steering here is
*traced*: the DOA argmax, the array manifold, and the blocking matrix are all
computed inside the jitted graph, so every utterance in the batch gets its own
look direction — and the whole thing shards over (batch, freq) mesh axes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.filterbank import analysis_snapshots_half, synthesis_half
from . import beamforming as bf
from .localization import srp_dsbla, srp_phat, srp_phat_steering_table

__all__ = ["build_steered_pipeline"]


def build_steered_pipeline(
    cfg,
    mpos,
    h,
    g,
    thetas,
    phis,
    sspeed: float = 343740.0,
    min_bin: int = 1,
    max_bin: int | None = None,
    bin_sharding=None,
    doa_protocol: str = "srp_phat",
    energy_threshold: float = 0.0,
):
    """Build jitted ``enhance(x [B, C, T]) -> (y [B, T_out], doa [B, 2])``.

    ``cfg``: PipelineConfig with beamformer ds | gsc_lms | gsc_rls and
    postfilter none | zelinski.  ``thetas``/``phis``: the polar/azimuth search
    grid (radians).  The per-utterance DOA (theta, phi) is returned alongside
    the enhanced audio.

    ``doa_protocol``: ``"srp_phat"`` (default — whole-utterance PHAT-weighted
    SRP sum, the fast estimator) or ``"dsbla"`` — the reference
    DOAEstimatorSRPDSBLA protocol (models.localization.srp_dsbla): per-frame
    D&S response power, frames below ``energy_threshold`` skipped, argmax of
    the accumulated powers (robust to silence padding;
    beamformer.cc:3125-3197).
    """
    from ..utils.geometry import calc_ca_delays
    from .adaptive_gsc import gsc_postfilter_fused, gsc_lms, gsc_rls

    if cfg.beamformer not in ("ds", "gsc_lms", "gsc_rls"):
        raise ValueError(f"steered pipeline supports ds|gsc_lms|gsc_rls, got {cfg.beamformer}")
    if cfg.postfilter not in ("none", "zelinski"):
        raise ValueError(f"steered pipeline supports none|zelinski, got {cfg.postfilter}")

    M = cfg.fb.M
    fs = cfg.samplerate
    mpos = np.asarray(mpos, np.float64)

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        steering, grid = srp_phat_steering_table(mpos, M, fs, thetas, phis, sspeed)
        delay_table = np.stack(
            [calc_ca_delays(mpos, p, t, sspeed) for t, p in np.asarray(grid)]
        )  # [G, C]
    if doa_protocol not in ("srp_phat", "dsbla"):
        raise ValueError(f"unknown doa_protocol {doa_protocol!r}")
    if doa_protocol == "dsbla":
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            # wq steering table (e^{-j.}/C convention, calcMainlobe)
            wq_table = np.stack(
                [np.asarray(bf.array_manifold(M, fs, d)) for d in delay_table]
            )
        wq_table_j = jnp.asarray(wq_table)
    steering = jnp.asarray(steering)
    grid_j = jnp.asarray(grid)
    delay_table = jnp.asarray(delay_table, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    g = jnp.asarray(g, jnp.float32)

    def _one(x):
        # fused half-band analysis + snapshot transpose (real-first: see
        # ops.filterbank.analysis_snapshots_half compile note)
        X = analysis_snapshots_half(x, h, cfg.fb)  # [Tf, F, C]
        if bin_sharding is not None:
            X = jax.lax.with_sharding_constraint(X, bin_sharding)
        energy = bf.frame_energy_half(X[..., 0], M)

        # --- in-graph DOA estimate ------------------------------------
        if doa_protocol == "dsbla":
            nbest, _, _ = srp_dsbla(
                X, wq_table_j, min_bin, max_bin, energy_threshold, 1
            )
            gidx = nbest[0]
        else:
            srp = srp_phat(X, steering, min_bin, max_bin)  # [Tf, G]
            gidx = jnp.argmax(jnp.sum(srp, axis=0))
        doa = grid_j[gidx]  # (theta, phi)
        delays = delay_table[gidx]  # [C]

        # --- steer the beamformer at the estimate -----------------------
        vs = bf.array_manifold(M, fs, delays)  # [F, C] traced
        wqH = jnp.conj(vs)
        if cfg.beamformer == "ds":
            Y = bf.apply_weights(wqH, X)
            if cfg.postfilter == "zelinski":
                from .postfilter import zelinski_postfilter

                # alignment vector is the manifold vs (the C++ ta_), not the
                # conjugated apply weights (beamformer.cc:960-965)
                Y = zelinski_postfilter(X, Y, vs, cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames)
        else:
            BmH = jnp.swapaxes(bf.blocking_matrix(vs, cfg.Nc), -1, -2)
            kind = "lms" if cfg.beamformer == "gsc_lms" else "rls"
            gcfg = cfg.lms if kind == "lms" else cfg.rls
            if cfg.postfilter == "zelinski":
                # postfilter alignment uses the manifold vs (the C++ ta_),
                # not the conjugated apply weights (beamformer.cc:960-965)
                Y = gsc_postfilter_fused(
                    X, energy, wqH, BmH, vs, kind, gcfg,
                    cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
                )
            else:
                run = gsc_lms if kind == "lms" else gsc_rls
                Y, _ = run(X, energy, wqH, BmH, gcfg)

        return synthesis_half(Y, g, cfg.fb), doa

    # ---- batched paired-Pallas fast path (round 5) --------------------
    # For the BASELINE config-5 chain (gsc_rls + zelinski, srp_phat DOA)
    # the vmap-of-XLA-scan above is launch-bound (the round-4 config5
    # number); this path runs ONE fused analysis kernel, a batched SRP
    # einsum, traced per-utterance steering, and the paired Pallas scan
    # with per-row weight planes (gsc_rls_zelinski_steered_pallas).
    pallas_ok = (
        cfg.beamformer == "gsc_rls"
        and cfg.postfilter == "zelinski"
        and doa_protocol == "srp_phat"
        and bin_sharding is None
        and M % 256 == 0
        and cfg.fb.D % 128 == 0
        and min_bin == 1 and max_bin is None
    )
    from .pipeline import PALLAS_FB, PALLAS_SCAN

    on_tpu = jax.default_backend() not in ("cpu",)
    if pallas_ok and PALLAS_FB and PALLAS_SCAN and on_tpu:
        return _build_steered_pallas(
            cfg, h, g, steering, grid_j, delay_table, fs, M, interpret=False)

    @jax.jit
    def enhance(x):
        """x: [B, C, T] -> (y [B, T_out], doa [B, 2])."""
        return jax.vmap(_one)(x)

    return enhance


def _build_steered_pallas(cfg, h, g, steering, grid_j, delay_table, fs, M,
                          interpret=False):
    """Batched time-major steered chain: analysis (one Pallas kernel) ->
    SRP-PHAT DOA (one MXU einsum over the steering table) -> traced
    per-utterance manifold/blocking weights -> paired Pallas GSC-RLS +
    Zelinski with per-row planes -> fused synthesis.  Equal to the vmapped
    `_one` chain (tests/test_steered_pallas.py)."""
    from ..ops.pallas_kernels import analysis_tm_fused, synthesis_tm_fused
    from ..ops.filterbank import analysis_half_real_tm, synthesis_half_real_tm
    from .adaptive_gsc import GSCRLSConfig  # noqa: F401 (type reference)
    from .pallas_fused_scan import gsc_rls_zelinski_steered_pallas

    Mh = M // 2
    hj = jnp.asarray(h, jnp.float32)
    gj = jnp.asarray(g, jnp.float32)

    @jax.jit
    def enhance(x):
        """x: [B, C, T] -> (y [B, T_out], doa [B, 2])."""
        if interpret:
            Yp = analysis_half_real_tm(x, hj, cfg.fb, packed=True)
        else:
            Yp = analysis_tm_fused(x, hj, cfg.fb, packed=True)
        # complex snapshots [Tf, B, F, C] from the packed lanes (DOA only)
        re = Yp[..., : Mh + 1]
        z = jnp.zeros(Yp.shape[:-1] + (1,), Yp.dtype)
        im = jnp.concatenate([z, Yp[..., Mh + 1 :], z], axis=-1)
        X = jnp.swapaxes(jax.lax.complex(re, im), 2, 3)
        srp = srp_phat(jnp.moveaxis(X, 0, 1), steering, 1, None)  # [B,Tf,G]
        gidx = jnp.argmax(jnp.sum(srp, axis=1), axis=-1)  # [B]
        delays = delay_table[gidx]  # [B, C]
        vs = jax.vmap(lambda d: bf.array_manifold(M, fs, d))(delays)
        wq_b = jnp.conj(vs)  # [B, F, C]
        bm_b = jnp.swapaxes(bf.blocking_matrix(vs, cfg.Nc), -1, -2)
        Yb = gsc_rls_zelinski_steered_pallas(
            Yp, wq_b, bm_b, vs, cfg.rls, cfg.pf_alpha, cfg.pf_type,
            cfg.pf_min_frames, interpret=interpret,
        )
        if interpret:
            y = synthesis_half_real_tm(Yb, gj, cfg.fb)
        else:
            y = synthesis_tm_fused(Yb, gj, cfg.fb)
        return y, grid_j[gidx]

    return enhance
