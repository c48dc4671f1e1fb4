"""End-to-end enhancement pipelines: analysis -> beamform -> postfilter -> synthesis.

The flagship "model" of the framework: the batched equivalent of the
reference's canonical pull-graph (unit_test/test_online_beamforming.py:82-159:
SampleFeature -> OverSampledDFTAnalysisBank per channel -> beamformer ->
ZelinskiPostFilter -> OverSampledDFTSynthesisBank), expressed as one jittable
function over an utterance batch ``x [B, C, T]``.

Sharding: the batch axis is data-parallel; the beamformer/postfilter stages
operate per frequency bin and carry a sharding constraint on the bin axis so
pjit can split them across chips (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..ops import dft
from ..ops.filterbank import (
    FilterbankParams,
    analysis,
    analysis_half,
    analysis_half_real_tm,
    analysis_snapshots_half,
    hermitian_mirror,
    synthesis,
    synthesis_half,
    synthesis_half_real_tm,
    synthesis_half_tm,
)

# With the DFT-as-matmul transforms (ops/dft.py) the half-band path does
# half the MXU work and half the HBM traffic of the full-M path, so it is
# the default.  Set DSR_HALF_BAND=0 to run full-M complex transforms end to
# end (only useful for debugging the hermitian-mirror algebra).
HALF_BAND = os.environ.get("DSR_HALF_BAND", "1") == "1"
# Time-major fused path: the analysis output stays packed real
# [T, B, C, M] (see ops.dft._analysis_matrix_packed), the fused adaptive
# scan runs batch-natively over the leading frame axis, and synthesis
# consumes the packed scan output.  Skips the HBM snapshot transpose AND
# the internal [B, T, ..] -> [T, B, ..] transposes that vmap-of-scan
# forces; ~10% end-to-end on v5e (fetch-synced).  Same math, same operands.
TIME_MAJOR = os.environ.get("DSR_TIME_MAJOR", "1") == "1"
# Fused Pallas filterbank kernels (ops/pallas_kernels.analysis_tm_fused /
# synthesis_tm_fused): FIR + DFT matmul (+ overlap-add) in one kernel, no
# intermediate HBM tensors.  Bit-compatible with the XLA stages (same
# matrices, same accumulation order); measured ~1.4x analysis / ~1.9x
# synthesis stage speedups on v5e.  Requires a TPU backend and lane-aligned
# blocks (D % 128 == 0); falls back to the XLA stages otherwise.
PALLAS_FB = os.environ.get("DSR_PALLAS_FB", "1") == "1"
# Fused Pallas GSC-RLS+Zelinski scan (models/pallas_fused_scan.py): the
# adaptive state (RLS precision triangle, active weights, CSD accumulators)
# stays resident in VMEM across the whole utterance instead of being
# re-read/re-written from HBM every frame by lax.scan.  Bit-compatible with
# the XLA fused scan (same operand order); requires TPU + M % 256 == 0.
# DEFAULT ON since round 4: the round-3 real-speech device NaN was
# root-caused to arithmetic BLENDS of speculative values in the kernel
# (``over*scale + (1-over)`` with scale = sqrt(max_wa/waK2) -> inf on
# near-silent bins -> 0*inf = NaN; XLA-CPU's simplifier rewrote the blend
# to a select, which is why interpret mode was finite while Mosaic, which
# lowers the literal mul-add, NaN'd).  The kernel now uses jnp.where
# selects with a finite-by-construction scale, matching the XLA scan
# (adaptive_gsc.py:288-322) operand for operand; verified on v5e against
# a deterministic near-silent-bin trigger that reproduced the old NaN
# (bench.py selfcheck includes that trigger in every artifact).
# Measured 65.7 ms vs the XLA scan's 95.1 ms at the bench shape
# (Tf=1248, B=640) on v5e.  DSR_PALLAS_SCAN=0 opts out.
PALLAS_SCAN = os.environ.get("DSR_PALLAS_SCAN", "1") == "1"
# Batch rows per Pallas grid step in the fused scan kernels.  The scan
# kernels are grid-step (launch/sequential) bound at Bb=8 — each vector op
# covers only one (8, 128) sublane group per 128 lanes — so wider tiles cut
# the sequential step count proportionally at the same total vector work.
# Bounded by VMEM (~16 MB/core): the fused mono kernel carries
# O(K*C + Bc*3) [Bb, M] planes.
BATCH_TILE = int(os.environ.get("DSR_BATCH_TILE", "8"))
from . import beamforming as bf
from . import postfilter as pfm
from .adaptive_gsc import GSCLMSConfig, GSCRLSConfig, gsc_lms, gsc_rls, gsc_weights

__all__ = ["PipelineConfig", "build_pipeline", "enhance", "path_flags"]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration mirroring the reference's JSON config surface
    (unit_test/confs/*.json: beamformer{type}, postfilter{type,subtype,alpha})."""

    fb: FilterbankParams = FilterbankParams()
    samplerate: float = 16000.0
    beamformer: str = "ds"  # ds | sd_mvdr | lcmv | gsc_lms | gsc_rls
    postfilter: str = "none"  # none | zelinski | mccowan | lefkimmiatis | apab
    pf_alpha: float = 0.6
    pf_type: int = pfm.PostFilterType.ZELINSKI1_REAL
    pf_min_frames: int = 0
    sd_mu: float = 0.01
    Nc: int = 1
    lms: GSCLMSConfig = GSCLMSConfig()
    rls: GSCRLSConfig = GSCRLSConfig()
    # full-chain extensions (BASELINE config 4: AEC -> WPE -> GSC -> postfilter)
    aec: str = "none"  # none | nlms | kalman | block_kalman
    aec_delta: float = 100.0       # nlms delta | kalman beta | block_kalman beta
    aec_epsilon: float = 1.0e-4    # nlms epsilon | (block_)kalman sigma2
    aec_threshold: float = 100.0
    aec_taps: int = 1              # block_kalman sampleN
    wpe: bool = False
    wpe_lower: int = 2
    wpe_upper: int = 6
    wpe_iterations: int = 2
    wpe_band_width: float = 0.0  # >0: reference band limit (dereverberation.h:38)
    # Batched WPE materializes a [bc, C, T, F, C*P] lag tensor; chunking the
    # batch axis (sequential lax.map of vmapped chunks) bounds it to
    # ~chunk x 26 MB at the bench shape instead of B x 26 MB (16+ GB).
    wpe_batch_chunk: int = 64
    # Opt-in: request bf16 operands for the WPE lag-covariance matmuls
    # (f32 accumulation).  Default OFF.  Measured on v5e: Mosaic's dot
    # lowering showed NO throughput or numeric change for in-kernel bf16
    # casts with preferred_element_type=f32 (operands evidently promoted),
    # so this is a no-op on the current toolchain — kept as the tested
    # hook for toolchains that honor mixed-precision pallas dots
    # (interpret-mode contract: tests/test_pallas_fused.py
    # test_wpe_bf16_stats_close_to_f32, ~3.5% deviation class).
    wpe_bf16_stats: bool = False


def path_flags(cfg: "PipelineConfig", n_chan: int) -> dict:
    """The exact lowering predicates ``build_pipeline`` uses, in one place.

    Returns {"fused", "time_major", "pallas_fb", "pallas_scan"} for the
    single-chip (unsharded) build.  bench.py derives its selfcheck gate from
    this instead of re-approximating the conditions (they drifted once).
    """
    fused = cfg.beamformer in ("gsc_lms", "gsc_rls") and cfg.postfilter == "zelinski"
    tm_base = TIME_MAJOR and HALF_BAND and cfg.fb.M <= dft.MATMUL_MAX_M
    # AEC/WPE joined the time-major path in round 3: the AEC scans are
    # shape-generic over [T, B, C, F] (aec._aec_state_shape) and WPE is a
    # dense batched estimate+apply; both slot between analysis and the fused
    # adaptive scan (BASELINE config 4).  block_kalman with >1 tap stays on
    # the vmap path (per-utterance tap stacking).
    tm_full_ok = cfg.aec in ("none", "nlms", "kalman") or (
        cfg.aec == "block_kalman" and cfg.aec_taps == 1
    )
    time_major = tm_base and fused and tm_full_ok
    on_tpu = jax.default_backend() not in ("cpu",)
    pallas_fb = time_major and PALLAS_FB and cfg.fb.D % 128 == 0 and on_tpu
    pallas_scan = (
        time_major
        and PALLAS_SCAN
        and cfg.beamformer == "gsc_rls"
        and cfg.postfilter == "zelinski"
        and on_tpu
    )
    if pallas_scan:
        from .pallas_fused_scan import pallas_scan_supported

        pallas_scan = pallas_scan_supported(cfg.fb.M, n_chan)
    # Fixed-weight + Zelinski on the packed TM path with the fixed-weight
    # Pallas kernel (round 3): removes the launch-bound sequential CSD scan
    # that capped the D&S/SD-MVDR/LCMV + postfilter configs.
    pallas_fw = (
        tm_base
        and cfg.beamformer in ("ds", "sd_mvdr", "lcmv")
        and cfg.postfilter == "zelinski"
        and cfg.aec == "none"
        and not cfg.wpe
        and PALLAS_SCAN
        and PALLAS_FB
        and cfg.fb.D % 128 == 0
        and on_tpu
    )
    if pallas_fw:
        from .pallas_fused_scan import pallas_scan_supported

        pallas_fw = pallas_scan_supported(cfg.fb.M, n_chan)
    return {
        "fused": fused,
        "time_major": time_major,
        "tm_chain": time_major and (cfg.aec != "none" or cfg.wpe),
        "pallas_fb": pallas_fb,
        "pallas_scan": pallas_scan,
        "pallas_fw": pallas_fw,
    }


def _tm_shardings(bin_sharding):
    """Derive the time-major layouts ``[Tf, B, F, C]`` / ``[Tf, B, F]`` from
    a caller-supplied bin sharding.

    Accepts either a 4-axis time-major NamedSharding directly, or any
    NamedSharding over a mesh with the standard (batch, freq) axis names
    (parallel/mesh.MESH_AXES), from which the TM specs are rebuilt.  Returns
    ``None`` when the layout cannot be derived (caller falls back to the
    vmap path).
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    if not isinstance(bin_sharding, NamedSharding):
        return None
    mesh = bin_sharding.mesh
    spec = tuple(bin_sharding.spec)
    if len(spec) == 4:  # already a [Tf, B, F, C] spec
        return bin_sharding, NamedSharding(mesh, P(*spec[:3]))
    if {"batch", "freq"} <= set(mesh.axis_names):
        return (
            NamedSharding(mesh, P(None, "batch", "freq", None)),
            NamedSharding(mesh, P(None, "batch", "freq")),
        )
    return None


def _batch_only_mesh(bin_sharding):
    """The mesh, if the given sharding parallelizes over ``batch`` only
    (no ``freq`` axis, or a size-1 one) — the zero-penalty data-parallel
    deployment; ``None`` otherwise."""
    from jax.sharding import NamedSharding

    if not isinstance(bin_sharding, NamedSharding):
        return None
    mesh = bin_sharding.mesh
    shape = dict(mesh.shape)
    if "batch" not in shape or shape.get("batch", 1) < 1:
        return None
    if shape.get("freq", 1) != 1:
        return None
    spec_axes = {a for s in tuple(bin_sharding.spec) if s
                 for a in ((s,) if isinstance(s, str) else tuple(s))}
    # a size-1 mesh axis in the spec splits nothing — without this the
    # standard snapshot_sharding(mesh, ...) spec (which always names
    # "freq") silently routed batch-only meshes down the freq-sharded
    # complex-layout branch
    spec_axes = {a for a in spec_axes if shape.get(a, 1) > 1}
    if spec_axes - {"batch"}:
        return None
    return mesh


def _beamform_one(cfg: PipelineConfig, X, energy, wqH, BmH):
    """Beamform one utterance's snapshots X [T, F, C] -> [T, F]."""
    if cfg.beamformer in ("ds", "sd_mvdr", "lcmv"):
        return bf.apply_weights(wqH, X)
    if cfg.beamformer == "gsc_lms":
        Y, _ = gsc_lms(X, energy, wqH, BmH, cfg.lms)
        return Y
    if cfg.beamformer == "gsc_rls":
        Y, _ = gsc_rls(X, energy, wqH, BmH, cfg.rls)
        return Y
    raise ValueError(f"unknown beamformer {cfg.beamformer!r}")


def _postfilter_one(cfg: PipelineConfig, X, Y, wq_manifold, Gamma):
    if cfg.postfilter == "none":
        return Y
    if cfg.postfilter == "zelinski":
        return pfm.zelinski_postfilter(
            X, Y, wq_manifold, cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames
        )
    if cfg.postfilter == "mccowan":
        return pfm.mccowan_postfilter(
            X, Y, wq_manifold, Gamma, cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames
        )
    if cfg.postfilter == "lefkimmiatis":
        return pfm.lefkimmiatis_postfilter(
            X, Y, wq_manifold, Gamma, cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames
        )
    if cfg.postfilter == "apab":
        return pfm.apab_postfilter(X, Y, wq_manifold)
    raise ValueError(f"unknown postfilter {cfg.postfilter!r}")


def build_pipeline(
    cfg: PipelineConfig,
    mpos,
    delays,
    h: np.ndarray,
    g: np.ndarray,
    bin_sharding=None,
    noise_delays=None,
):
    """Build a jittable ``enhance(x [B, C, T]) -> y [B, T_out]`` closure.

    Weights (manifold, quiescent, blocking matrix, diffuse coherence) are
    computed once at build time, like the reference's out-of-loop
    ``wrapper_weights_calculator`` (test_online_beamforming.py:166-183).
    ``bin_sharding``: optional sharding applied to the bin axis of the
    beamformer-stage tensors (a jax.sharding.NamedSharding for [T, F, C]
    or compatible), letting pjit split bins across chips.
    """
    M = cfg.fb.M
    fs = cfg.samplerate
    delays = np.asarray(delays)

    # Weight-table setup is tiny host-side compute; pin it to the CPU backend
    # (the experimental axon TPU backend also mishandles some eager complex
    # ops, and constants embed into the jitted program regardless).
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        vs = bf.array_manifold(M, fs, delays)
        # Postfilter alignment vector = the C++ ta_ (BeamformerWeights::
        # setTimeAlignment copies wq_ = e^{-j2pi f tau}/C into ta_,
        # beamformer.cc:960-965); the postfilters conjugate it per channel
        # (time_alignment_, postfilter.cc:30-43).  NOT the conjugated apply
        # weights — verified against the compiled reference
        # (tests/test_cpp_golden.py).
        wq_manifold = np.asarray(vs)
        if cfg.beamformer == "ds":
            wqH = np.conj(wq_manifold)
            BmH = None
        elif cfg.beamformer == "lcmv":
            # null steering: target + jammer manifolds as constraints
            # (calc_gsc_weights_n path, test_online_beamforming.py:170-183)
            njs = [bf.array_manifold(M, fs, np.asarray(d)) for d in (noise_delays or [])]
            constraints = jnp.stack([vs] + njs, axis=1)  # [F, Nc, C]
            gains = np.zeros(1 + len(njs))
            gains[0] = 1.0
            wqH = np.asarray(bf.lcmv_weights(constraints, gains))
            BmH = None
        elif cfg.beamformer == "sd_mvdr":
            wqH = np.asarray(bf.superdirective_weights(mpos, delays, M, fs, mu=cfg.sd_mu))
            BmH = None
        elif cfg.beamformer in ("gsc_lms", "gsc_rls"):
            wqH, BmH = gsc_weights(M, fs, delays, cfg.Nc)
            wqH, BmH = np.asarray(wqH), np.asarray(BmH)
        else:
            raise ValueError(cfg.beamformer)

        if cfg.postfilter in ("mccowan", "lefkimmiatis"):
            Gamma = np.asarray(bf.diffuse_noise_coherence(mpos, M, fs))
        else:
            Gamma = None

    h = jnp.asarray(h, jnp.float32)
    g = jnp.asarray(g, jnp.float32)

    flags = path_flags(cfg, len(delays))
    fused = flags["fused"]

    def _one(x, play=None):
        """x: [C, T] (+ optional far-end playback [T]) -> enhanced [T_out]."""
        # Every stage below reads bins 0..M/2 only; the conjugate mirror is
        # restored at synthesis (beamformer.cc:1142-1152).
        if cfg.aec != "none" or cfg.wpe:
            from .aec import block_kalman_aec, kalman_aec, nlms_aec
            from .dereverberation import wpe_multichannel

            if HALF_BAND:
                subh = analysis_half(x, h, cfg.fb)  # [C, Tf, F]
            else:
                subh = analysis(x, h, cfg.fb)[..., : M // 2 + 1]
            if cfg.aec != "none":
                # far-end reference through the same analysis bank
                # (the echo-canceller features consume subband snapshots of
                # the played signal, aec.cc:41-81 / :118-164 / :244-308)
                if HALF_BAND:
                    Vh = analysis_half(play, h, cfg.fb)
                else:
                    Vh = analysis(play, h, cfg.fb)[..., : M // 2 + 1]
                if cfg.aec == "nlms":
                    cancel = lambda A: nlms_aec(
                        Vh, A, cfg.aec_delta, cfg.aec_epsilon, cfg.aec_threshold
                    )[0]
                elif cfg.aec == "kalman":
                    cancel = lambda A: kalman_aec(
                        Vh, A, cfg.aec_delta, cfg.aec_epsilon, cfg.aec_threshold
                    )[0]
                elif cfg.aec == "block_kalman":
                    cancel = lambda A: block_kalman_aec(
                        Vh, A, cfg.aec_taps, cfg.aec_delta, cfg.aec_epsilon,
                        threshold=cfg.aec_threshold,
                    )[0]
                else:
                    raise ValueError(f"unknown aec {cfg.aec!r}")
                subh = jax.vmap(cancel)(subh)
            if cfg.wpe:
                subh = wpe_multichannel(subh, cfg.wpe_lower, cfg.wpe_upper,
                                        cfg.wpe_iterations,
                                        band_width=cfg.wpe_band_width,
                                        samplerate=cfg.samplerate)
            X = jnp.moveaxis(subh, 0, -1)  # [Tf, F, C]
        elif HALF_BAND:
            # fused analysis + snapshot transpose (real-first: see
            # ops.filterbank.analysis_snapshots_half compile note)
            X = analysis_snapshots_half(x, h, cfg.fb)  # [Tf, F, C]
        else:
            X = jnp.moveaxis(analysis(x, h, cfg.fb)[..., : M // 2 + 1], 0, -1)
        if bin_sharding is not None:
            X = jax.lax.with_sharding_constraint(X, bin_sharding)
        energy = bf.frame_energy_half(X[..., 0], M)  # [Tf] (channel 0)
        if fused:
            # one scan instead of GSC scan + CSD scan (identical outputs,
            # half the sequential steps)
            from .adaptive_gsc import gsc_postfilter_fused

            kind = "lms" if cfg.beamformer == "gsc_lms" else "rls"
            gcfg = cfg.lms if kind == "lms" else cfg.rls
            Y = gsc_postfilter_fused(
                X, energy, jnp.asarray(wqH), jnp.asarray(BmH),
                jnp.asarray(wq_manifold), kind, gcfg,
                cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
            )
        else:
            Y = _beamform_one(cfg, X, energy, wqH, BmH)  # [Tf, F]
            Y = _postfilter_one(cfg, X, Y, wq_manifold, Gamma)
        if HALF_BAND:
            return synthesis_half(Y, g, cfg.fb)
        return synthesis(hermitian_mirror(Y, M), g, cfg.fb)

    # Time-major only pays for the fused adaptive scans (it removes the
    # [B,T]<->[T,B] transposes vmap-of-scan forces); for fixed-weight
    # pipelines the vmap layout measured faster under fetch-synced timing
    # (ds 60.8k vs 55.7k, sd_mvdr+zelinski 44.8k vs 40.8k audio-s/s on
    # v5e), so they keep it.
    time_major = flags["time_major"]

    # Freq-sharded flagship: the packed [Re | Im] lane layout cannot be
    # split over bins (Re and Im of one bin live M/2 lanes apart), so the
    # multi-chip time-major path runs the complex [Tf, B, F, C] snapshot
    # layout instead and constrains the bin axis to the mesh's ``freq``
    # axis — the scan state ([B, F, ...]) inherits the split by
    # propagation, so each chip carries only its bins' RLS/CSD state
    # (the per-bin independence scaled here: beamformer.cc:1142-1152).
    # Measured single-chip cost of this layout: 33.8k vs the packed path's
    # 55.3k audio-s/s (bench.py "sharded_layout").  Closing that gap needs a
    # packed-PER-SHARD layout: each freq shard carrying its own
    # [Re(bins) | Im(bins)] lane pair so the Pallas kernels run shard-
    # locally.  That requires (a) shard-local analysis emitting per-shard
    # packed lanes (a sliced-column DFT matrix per shard — shard_map over
    # the bin-partitioned DFT), and (b) a shard-width-templated scan kernel.
    # LANE-GRANULARITY BOUND (why it is NOT a win at the flagship M=256):
    # the kernel's Re|Im halves must each be a whole number of 128-lane
    # vreg groups (Mosaic slices/concats fault off-boundary), so the
    # smallest per-shard block is 2x128 = 256 lanes — exactly the full
    # M=256 problem.  A per-shard kernel at M=256 would run the SAME
    # vector width per chip as the unsharded kernel (zero compute saving);
    # packed-per-shard only starts paying at M >= 512 (2 shards of 256
    # lanes) and scales as M/256 shards.  For the flagship, the optimal
    # mesh is therefore batch-only (below: zero-penalty, implemented);
    # the M>=512 shard-local kernel is future work.
    # Batch-ONLY sharding: each chip runs the full packed+Pallas fast path
    # on its own batch shard under shard_map — zero collectives, zero
    # layout penalty (pure data parallelism, the production scaling mode
    # for throughput workloads).  The freq-sharded branch below remains
    # the model-parallel option (small batches / latency), with its layout
    # cost recorded per round in the bench artifact.
    batch_mesh = _batch_only_mesh(bin_sharding) if bin_sharding is not None else None
    if batch_mesh is not None:
        from jax.sharding import PartitionSpec as P

        inner = build_pipeline(cfg, mpos, delays, h, g, bin_sharding=None)
        specs = (P("batch"), P("batch")) if cfg.aec != "none" else P("batch")
        return jax.jit(jax.shard_map(
            inner, mesh=batch_mesh, in_specs=specs, out_specs=P("batch"),
            check_vma=False,
        ))

    tm_shardings = None
    if time_major and bin_sharding is not None:
        tm_shardings = _tm_shardings(bin_sharding)
        if tm_shardings is None:
            time_major = False  # un-derivable layout: fall back to vmap path
    if flags["tm_chain"] and bin_sharding is not None:
        time_major = False  # sharded full chain not yet laid out: vmap path

    if flags["pallas_fw"] and bin_sharding is None:
        from ..ops.pallas_kernels import analysis_tm_fused, synthesis_tm_fused
        from .pallas_fused_scan import (
            analysis_fw_synthesis_pallas,
            fused_frame_tile,
            zelinski_apply_pallas,
        )

        if M <= dft.MATMUL_MAX_M and cfg.fb.D % 128 == 0:
            # fixed-weight MONO kernel (round 5): analysis + wq^H X +
            # Zelinski + synthesis in ONE pallas_call — strictly simpler
            # than the adaptive mono kernel, so BASELINE configs 1-2 run
            # at or above the flagship number
            ftw = max(16, fused_frame_tile(cfg.fb))

            @jax.jit
            def enhance(x):
                """x: [B, C, T] -> [B, T_out] (fixed-weight mono kernel)."""
                return analysis_fw_synthesis_pallas(
                    x, h, g, cfg.fb, wqH, wq_manifold,
                    cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
                    frame_tile=ftw, batch_tile=BATCH_TILE,
                )
        else:

            @jax.jit
            def enhance(x):
                """x: [B, C, T] -> [B, T_out] (fixed-weight packed TM fast
                path: Pallas filterbanks + fused fixed-weight Zelinski
                kernel)."""
                Yr = analysis_tm_fused(x, h, cfg.fb, packed=True)
                Yp = zelinski_apply_pallas(
                    Yr, wqH, wq_manifold,
                    cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
                )
                return synthesis_tm_fused(Yp, g, cfg.fb)

    elif cfg.aec != "none" and not time_major:

        @jax.jit
        def enhance(x, play):
            """x: [B, C, T], play: [B, T] far-end reference -> [B, T_out]."""
            return jax.vmap(_one)(x, play)

    elif time_major and tm_shardings is not None:
        from .adaptive_gsc import gsc_postfilter_fused

        kind = "lms" if cfg.beamformer == "gsc_lms" else "rls"
        gcfg = cfg.lms if kind == "lms" else cfg.rls
        F = M // 2 + 1
        X_sharding, Y_sharding = tm_shardings

        @jax.jit
        def enhance(x):
            """x: [B, C, T] -> [B, T_out] (time-major freq-sharded path)."""
            Yr = analysis_half_real_tm(x, h, cfg.fb, packed=False)  # [Tf,B,C,2F]
            X = jnp.moveaxis(
                jax.lax.complex(Yr[..., :F], Yr[..., F:]), -2, -1
            )  # [Tf, B, F, C]
            X = jax.lax.with_sharding_constraint(X, X_sharding)
            # dense pre-pass (one all-reduce over freq shards) instead of a
            # per-scan-step reduction
            energy = bf.frame_energy_half(X[..., 0], M)  # [Tf, B]
            Y = gsc_postfilter_fused(
                X, energy, jnp.asarray(wqH), jnp.asarray(BmH),
                jnp.asarray(wq_manifold), kind, gcfg,
                cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
            )  # [Tf, B, F] complex, freq-sharded
            Y = jax.lax.with_sharding_constraint(Y, Y_sharding)
            return synthesis_half_tm(Y, g, cfg.fb)

    elif time_major:
        from .adaptive_gsc import gsc_postfilter_fused

        kind = "lms" if cfg.beamformer == "gsc_lms" else "rls"
        gcfg = cfg.lms if kind == "lms" else cfg.rls
        F = M // 2 + 1
        pallas_fb = flags["pallas_fb"]
        if pallas_fb:
            from ..ops.pallas_kernels import analysis_tm_fused, synthesis_tm_fused
        pallas_scan = flags["pallas_scan"]
        if pallas_scan:
            from .pallas_fused_scan import gsc_rls_zelinski_pallas
        tm_chain = flags["tm_chain"]
        if tm_chain:
            from .aec import block_kalman_aec, kalman_aec, nlms_aec
            from .dereverberation import wpe_multichannel

        def _analyze(sig):
            if pallas_fb:
                return analysis_tm_fused(sig, h, cfg.fb, packed=True)
            return analysis_half_real_tm(sig, h, cfg.fb, packed=True)

        def _unpack(Yr):
            # packed [.., M] -> complex [.., F] (Im of DC/Nyquist are
            # structurally zero in the packed lane layout)
            zero = jnp.zeros_like(Yr[..., :1])
            im = jnp.concatenate([zero, Yr[..., F:], zero], axis=-1)
            return jax.lax.complex(Yr[..., :F], im)

        def _chain(Yr, play):
            """AEC -> WPE between analysis and the adaptive scan, all in the
            time-major layout (config 4; the reference chains the same
            feature nodes per channel, aec.cc:41-81 ->
            dereverberation.cc:214-275)."""
            from ..ops.pallas_aec import aec_scan_pallas, pallas_aec_supported

            pallas_aec = (
                cfg.aec != "none"
                and PALLAS_FB
                and jax.default_backend() not in ("cpu",)
                and pallas_aec_supported(cfg.aec, M)
            )
            if pallas_aec:
                # VMEM-resident scan directly on the packed lanes — the
                # complex unpack/repack around the XLA scan disappears
                Yr = aec_scan_pallas(
                    Yr, _analyze(play[:, None, :]), cfg.aec,
                    cfg.aec_delta, cfg.aec_epsilon, cfg.aec_threshold,
                )
                if not cfg.wpe:
                    return Yr
            if cfg.wpe and (cfg.aec == "none" or pallas_aec):
                from ..ops.pallas_wpe import pallas_wpe_supported as _pws

                n_ch = Yr.shape[2]
                P_taps = cfg.wpe_upper - cfg.wpe_lower + 1
                if (PALLAS_FB and jax.default_backend() not in ("cpu",)
                        and _pws(n_ch, P_taps)):
                    # packed-in/packed-out WPE: no complex intermediate
                    from .dereverberation import wpe_multichannel_packed_tm

                    return wpe_multichannel_packed_tm(
                        Yr, F, cfg.wpe_lower, cfg.wpe_upper,
                        cfg.wpe_iterations,
                        band_width=cfg.wpe_band_width,
                        samplerate=cfg.samplerate,
                        bf16_stats=cfg.wpe_bf16_stats,
                    )
            X = _unpack(Yr)  # [Tf, B, C, F] complex
            if cfg.aec != "none" and not pallas_aec:
                V = _unpack(_analyze(play[:, None, :]))  # [Tf, B, 1, F]
                if cfg.aec == "nlms":
                    X, _ = nlms_aec(
                        V, X, cfg.aec_delta, cfg.aec_epsilon, cfg.aec_threshold
                    )
                elif cfg.aec == "kalman":
                    X, _ = kalman_aec(
                        V, X, cfg.aec_delta, cfg.aec_epsilon, cfg.aec_threshold
                    )
                else:  # block_kalman, taps == 1 (path_flags gate)
                    X, _ = block_kalman_aec(
                        V, X, cfg.aec_taps, cfg.aec_delta, cfg.aec_epsilon,
                        threshold=cfg.aec_threshold,
                    )
            if cfg.wpe:
                Yb = jnp.moveaxis(X, 0, 2)  # [B, C, Tf, F]
                n_ch = Yb.shape[1]
                P_taps = cfg.wpe_upper - cfg.wpe_lower + 1
                from ..ops.pallas_wpe import pallas_wpe_supported

                if (PALLAS_FB and jax.default_backend() not in ("cpu",)
                        and pallas_wpe_supported(n_ch, P_taps)):
                    # Pallas lag kernel: whole batch in one call, no lag
                    # tensor in HBM (ops/pallas_wpe.py)
                    from .dereverberation import wpe_multichannel_batched

                    Yb = wpe_multichannel_batched(
                        Yb, cfg.wpe_lower, cfg.wpe_upper, cfg.wpe_iterations,
                        band_width=cfg.wpe_band_width,
                        samplerate=cfg.samplerate,
                    )
                else:
                    wpe_fn = lambda yb: wpe_multichannel(
                        yb, cfg.wpe_lower, cfg.wpe_upper, cfg.wpe_iterations,
                        band_width=cfg.wpe_band_width, samplerate=cfg.samplerate,
                    )
                    Bn = Yb.shape[0]
                    bc = max(1, min(cfg.wpe_batch_chunk, Bn))
                    if Bn > bc and Bn % bc == 0:
                        Yc = Yb.reshape((Bn // bc, bc) + Yb.shape[1:])
                        Yb = jax.lax.map(jax.vmap(wpe_fn), Yc).reshape(Yb.shape)
                    else:
                        Yb = jax.vmap(wpe_fn)(Yb)
                X = jnp.moveaxis(Yb, 2, 0)
            # repack [Re(0..Mh) | Im(1..Mh-1)]
            return jnp.concatenate(
                [jnp.real(X), jnp.imag(X)[..., 1 : F - 1]], axis=-1
            )

        def _enhance_tm(x, play=None):
            """x: [B, C, T] -> [B, T_out] (time-major packed fast path).

            Everything between the two square [M, M] DFT matmuls moves in
            the packed real ``[Re(0..M/2) | Im(1..M/2-1)]`` lane layout —
            no ragged 2F padding, no complex split/concat in HBM.
            """
            if pallas_scan and pallas_fb and not tm_chain:
                from ..ops import dft

                from .pallas_fused_scan import fused_frame_tile

                # frame_tile must cover the m*R-1 analysis window halo
                # (pallas_fused_scan._fused_prep precondition); 16 is the
                # measured sweet spot when it fits, wider prototypes
                # (e.g. M=1024, r=3 -> m*R-1 = 31) round up to it
                ft = max(16, fused_frame_tile(cfg.fb))
                if M <= dft.MATMUL_MAX_M and cfg.fb.D % 128 == 0:
                    # ONE kernel end to end: analysis + GSC-RLS + Zelinski
                    # + synthesis — neither the input spectrum nor the
                    # beamformed spectrum ever exists in HBM (the two-kernel
                    # split still wrote+read ~1.7 GB of beamformed frames at
                    # bench shapes)
                    from .pallas_fused_scan import analysis_gsc_synthesis_pallas

                    return analysis_gsc_synthesis_pallas(
                        x, h, g, cfg.fb, wqH, BmH, wq_manifold, gcfg,
                        cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
                        frame_tile=ft, batch_tile=BATCH_TILE,
                    )
                # single-kernel analysis + GSC-RLS + Zelinski: the packed
                # input spectrum never exists in HBM (3.3 GB of write+read
                # saved at bench shapes; 56k -> 81k audio-s/s/chip on v5e)
                from .pallas_fused_scan import analysis_gsc_rls_zelinski_pallas

                Yp = analysis_gsc_rls_zelinski_pallas(
                    x, h, cfg.fb, wqH, BmH, wq_manifold, gcfg,
                    cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
                    frame_tile=ft, batch_tile=BATCH_TILE,
                )
                return synthesis_tm_fused(Yp, g, cfg.fb)
            Yr = _analyze(x)  # [Tf, B, C, M]
            if tm_chain:
                Yr = _chain(Yr, play)
            if pallas_scan:
                # VMEM-resident adaptive state across the whole utterance
                Yp = gsc_rls_zelinski_pallas(
                    Yr, wqH, BmH, wq_manifold, gcfg,
                    cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames,
                )
            else:
                # energy=None: the reference-channel frame energy is computed
                # inside each scan step (no separate dense pass over Yr)
                Yp = gsc_postfilter_fused(
                    Yr, None, jnp.asarray(wqH), jnp.asarray(BmH),
                    jnp.asarray(wq_manifold), kind, gcfg,
                    cfg.pf_alpha, cfg.pf_type, cfg.pf_min_frames, True,
                )  # [Tf, B, M] packed (True = real_packed, positional arg)
            if pallas_fb:
                return synthesis_tm_fused(Yp, g, cfg.fb)
            return synthesis_half_real_tm(Yp, g, cfg.fb)

        if cfg.aec != "none":
            enhance = jax.jit(_enhance_tm)
        else:
            enhance = jax.jit(lambda x: _enhance_tm(x))

    else:

        @jax.jit
        def enhance(x):
            """x: [B, C, T] -> [B, T_out]."""
            return jax.vmap(_one)(x)

    return enhance


def enhance(cfg: PipelineConfig, mpos, delays, h, g, x):
    """One-shot convenience wrapper around `build_pipeline`."""
    return build_pipeline(cfg, mpos, delays, h, g)(x)
