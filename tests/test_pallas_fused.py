"""Interpret-mode equivalence of the fused Pallas filterbank kernels.

The production kernels (ops/pallas_kernels.analysis_tm_fused /
synthesis_tm_fused) fuse the polyphase FIR with the packed DFT matmuls of
the time-major pipeline (modulated.cc:375-409 / 551-606 algebra).  They must
be numerically identical (float32 reassociation noise only) to the XLA
stages `analysis_half_real_tm(packed=True)` / `synthesis_half_real_tm`,
which are themselves golden-tested against the reference's ring-buffer
semantics (tests/test_filterbank.py).  On CPU the kernels run in Pallas
interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _fresh_compiler_state():
    """Clear XLA-CPU compiler caches before every test in this module: the
    big interpret-mode fused kernels trip a late-suite XLA-CPU segfault
    when compiled on top of hundreds of cached executables (same class as
    the round-4 pipeline-test segfault; reproduced in
    test_paired_ilp_groups at ~70% of the full suite)."""
    jax.clear_caches()

from distant_speech_recognition_tpu.ops.filterbank import (
    FilterbankParams,
    analysis_half_real_tm,
    synthesis_half_real_tm,
)
from distant_speech_recognition_tpu.ops.pallas_kernels import (
    analysis_tm_fused,
    synthesis_tm_fused,
)
from distant_speech_recognition_tpu.utils.prototypes import load_pair


@pytest.fixture(scope="module")
def protos():
    return load_pair(256, 4, 1)


@pytest.mark.parametrize("dct", [0, 1, 2])
@pytest.mark.parametrize("packed", [True, False])
def test_analysis_tm_fused_matches_xla(rng, protos, dct, packed):
    h, _ = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=dct)
    x = (rng.standard_normal((2, 3, 5000)) * 100).astype(np.float32)
    ref = np.asarray(analysis_half_real_tm(jnp.asarray(x), jnp.asarray(h), p, packed=packed))
    out = np.asarray(
        analysis_tm_fused(
            jnp.asarray(x), jnp.asarray(h), p, packed=packed,
            frame_tile=16, batch_tile=8, interpret=True,
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-6 * np.abs(ref).max())


@pytest.mark.parametrize("dct", [0, 1, 2])
def test_synthesis_tm_fused_matches_xla(rng, protos, dct):
    h, g = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=dct)
    x = (rng.standard_normal((3, 4000)) * 100).astype(np.float32)
    Yp = analysis_half_real_tm(jnp.asarray(x), jnp.asarray(h), p, packed=True)
    ref = np.asarray(synthesis_half_real_tm(Yp, jnp.asarray(g), p))
    out = np.asarray(
        synthesis_tm_fused(Yp, jnp.asarray(g), p, frame_tile=16, batch_tile=8, interpret=True)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-6 * np.abs(ref).max())


def test_analysis_tm_fused_tile_invariance(rng, protos):
    """Tile sizes are a pure performance knob — outputs must not change."""
    h, _ = protos
    p = FilterbankParams(M=256, m=4, r=1)
    x = (rng.standard_normal((1, 2, 3000)) * 100).astype(np.float32)
    a = np.asarray(
        analysis_tm_fused(jnp.asarray(x), jnp.asarray(h), p, frame_tile=8,
                          batch_tile=8, interpret=True)
    )
    b = np.asarray(
        analysis_tm_fused(jnp.asarray(x), jnp.asarray(h), p, frame_tile=24,
                          batch_tile=16, interpret=True)
    )
    np.testing.assert_array_equal(a, b)


def test_fused_roundtrip_reconstruction(rng, protos):
    """analysis_tm_fused -> synthesis_tm_fused reconstructs the signal
    (the reference's analysis->synthesis identity, tools/filterbank)."""
    h, g = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=2)
    T = 6000
    x = (rng.standard_normal((1, T)) * 100).astype(np.float32)
    Yr = analysis_tm_fused(jnp.asarray(x), jnp.asarray(h), p, packed=True,
                           frame_tile=16, batch_tile=8, interpret=True)
    # [Tf, 1, M] packed -> synthesis
    y = np.asarray(
        synthesis_tm_fused(Yr, jnp.asarray(g), p, frame_tile=16, batch_tile=8,
                           interpret=True)
    )[0]
    # Reconstruction delay for type 2 is exactly zero frames of extra lag;
    # compare against the XLA round trip instead of the raw signal to avoid
    # re-deriving the group delay here.
    ref = np.asarray(
        synthesis_half_real_tm(
            analysis_half_real_tm(jnp.asarray(x), jnp.asarray(h), p, packed=True),
            jnp.asarray(g), p,
        )
    )[0]
    np.testing.assert_allclose(y, ref, rtol=0, atol=2e-5 * np.abs(ref).max())


@pytest.mark.parametrize("pf_type,min_frames", [(1, 2), (2, 0)])
def test_pallas_rls_zelinski_scan_matches_xla(rng, pf_type, min_frames):
    """The VMEM-resident fused GSC-RLS+Zelinski kernel equals the XLA fused
    scan (adaptive_gsc.gsc_postfilter_fused real_packed path) — including
    padding tiles (Tf and B not multiples of the tile sizes)."""
    from distant_speech_recognition_tpu.models.adaptive_gsc import (
        GSCRLSConfig,
        gsc_postfilter_fused,
        gsc_weights,
    )
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        gsc_rls_zelinski_pallas,
    )
    from distant_speech_recognition_tpu.utils import geometry

    M, C = 256, 4
    Tf, B = 19, 3  # deliberately not tile multiples
    Yp = (rng.standard_normal((Tf, B, C, M)) * 100).astype(np.float32)
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=np.pi / 3)
    wqH, BmH = gsc_weights(M, 16000.0, delays, 1)
    wqH, BmH = np.asarray(wqH), np.asarray(BmH)
    vs = np.asarray(array_manifold(M, 16000.0, delays))
    cfg = GSCRLSConfig(min_frames=4)
    want = np.asarray(
        gsc_postfilter_fused(
            jnp.asarray(Yp), None, jnp.asarray(wqH), jnp.asarray(BmH),
            jnp.asarray(vs), "rls", cfg, 0.6, pf_type, min_frames, True,
        )
    )
    got = np.asarray(
        gsc_rls_zelinski_pallas(
            jnp.asarray(Yp), wqH, BmH, vs, cfg, 0.6, pf_type, min_frames,
            frame_tile=4, batch_tile=2, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())


def test_zelinski_apply_pallas_matches_xla(rng, protos):
    """Fixed-weight beamformer + Zelinski Pallas kernel (interpret mode) ==
    apply_weights + zelinski_postfilter on the same frames."""
    import jax

    from distant_speech_recognition_tpu.models.beamforming import (
        apply_weights,
        array_manifold,
        superdirective_weights,
    )
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        zelinski_apply_pallas,
    )
    from distant_speech_recognition_tpu.models.postfilter import zelinski_postfilter

    h, _ = protos
    M, C, Tf, B = 256, 4, 23, 3
    F = M // 2 + 1
    fs = 16000.0
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = np.linspace(0, 3e-4, C)
    ta = np.asarray(array_manifold(M, fs, delays))
    wqH = np.asarray(superdirective_weights(mpos, delays, M, fs, mu=0.01))

    Yr = (rng.standard_normal((Tf, B, C, M)) * 100).astype(np.float32)
    out = np.asarray(zelinski_apply_pallas(
        jnp.asarray(Yr), wqH, ta, 0.6, 1, 2, frame_tile=4, batch_tile=8,
        interpret=True,
    ))  # packed [Tf, B, M]

    # reference: complex snapshots -> weights -> postfilter, per batch row
    zero = np.zeros((Tf, B, C, 1), np.float32)
    im = np.concatenate([zero, Yr[..., F:], zero], axis=-1)
    X = (Yr[..., :F] + 1j * im).astype(np.complex64)  # [Tf, B, C, F]
    X = np.moveaxis(X, 2, 3)  # [Tf, B, F, C]
    ref = []
    for b in range(B):
        Xb = jnp.asarray(X[:, b])
        Y = apply_weights(jnp.asarray(wqH), Xb)
        Y = zelinski_postfilter(Xb, Y, jnp.asarray(ta), 0.6, 1, 2)
        ref.append(np.asarray(Y))
    ref = np.stack(ref, axis=1)  # [Tf, B, F]
    # the packed lane layout has no slot for Im(DC)/Im(Nyquist) — synthesis
    # discards them, so drop them from the complex reference too
    ref[..., 0] = ref[..., 0].real
    ref[..., -1] = ref[..., -1].real
    got = out[..., :F] + 1j * np.concatenate(
        [np.zeros((Tf, B, 1)), out[..., F:], np.zeros((Tf, B, 1))], axis=-1
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=3e-5 * scale)


def test_pallas_rls_near_silent_bins_finite_and_matches(rng):
    """Near-silent top bins put the first adapted frame's ||wa||^2 in the
    f32 range where max_wa/waK2 overflows to inf (the round-3 device-NaN
    trigger, pybeamformer.py:862-865 norm-cap semantics).  The kernel must
    stay finite and equal to the XLA scan: it now folds every speculative
    value in with jnp.where SELECTS (never ``p*spec + (1-p)*other`` blends,
    which Mosaic lowers literally so a speculative inf becomes 0*inf=NaN
    on device; bench.py _nan_trigger_check re-certifies this on hardware).
    """
    from distant_speech_recognition_tpu.models.adaptive_gsc import (
        GSCRLSConfig,
        gsc_postfilter_fused,
        gsc_weights,
    )
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        gsc_rls_zelinski_pallas,
    )
    from distant_speech_recognition_tpu.utils import geometry

    M, C, Tf, B = 256, 4, 10, 2
    Yp = (rng.standard_normal((Tf, B, C, M)) * 100).astype(np.float32)
    lo, hi = 3 * M // 8, M // 2
    Yp[..., lo:hi + 1] *= 1.8e-8
    Yp[..., lo + M // 2:] *= 1.8e-8
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=np.pi / 3)
    wqH, BmH = gsc_weights(M, 16000.0, delays, 1)
    wqH, BmH = np.asarray(wqH), np.asarray(BmH)
    vs = np.asarray(array_manifold(M, 16000.0, delays))
    cfg = GSCRLSConfig(min_frames=2)
    want = np.asarray(
        gsc_postfilter_fused(
            jnp.asarray(Yp), None, jnp.asarray(wqH), jnp.asarray(BmH),
            jnp.asarray(vs), "rls", cfg, 0.6, 1, 0, True,
        )
    )
    got = np.asarray(
        gsc_rls_zelinski_pallas(
            jnp.asarray(Yp), wqH, BmH, vs, cfg, 0.6, 1, 0,
            frame_tile=4, batch_tile=2, interpret=True,
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())


@pytest.mark.parametrize("T", [5000, 4096])
def test_fused_analysis_scan_matches_split(rng, protos, T):
    """The single-kernel analysis+GSC-RLS+Zelinski == the split pipeline
    (analysis_tm_fused then gsc_rls_zelinski_pallas), including ragged
    frame counts."""
    from distant_speech_recognition_tpu.models.adaptive_gsc import (
        GSCRLSConfig,
        gsc_weights,
    )
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        analysis_gsc_rls_zelinski_pallas,
        gsc_rls_zelinski_pallas,
    )
    from distant_speech_recognition_tpu.ops.filterbank import FilterbankParams
    from distant_speech_recognition_tpu.utils import geometry

    h, _ = protos
    M, C, B = 256, 4, 3
    p = FilterbankParams(M=M, m=4, r=1, delay_compensation_type=2)
    x = (rng.standard_normal((B, C, T)) * 1500).astype(np.float32)
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=np.pi / 3)
    wqH, BmH = gsc_weights(M, 16000.0, delays, 1)
    wqH, BmH = np.asarray(wqH), np.asarray(BmH)
    vs = np.asarray(array_manifold(M, 16000.0, delays))
    cfg = GSCRLSConfig(min_frames=4)

    from distant_speech_recognition_tpu.ops.pallas_kernels import analysis_tm_fused

    Yr = analysis_tm_fused(jnp.asarray(x), jnp.asarray(h), p, packed=True,
                           interpret=True)
    want = np.asarray(gsc_rls_zelinski_pallas(
        Yr, wqH, BmH, vs, cfg, 0.6, 1, 2,
        frame_tile=16, batch_tile=2, interpret=True,
    ))
    got = np.asarray(analysis_gsc_rls_zelinski_pallas(
        jnp.asarray(x), h, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        frame_tile=16, batch_tile=2, interpret=True,
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4 * np.abs(want).max())


@pytest.mark.parametrize("T", [5000, 4096])
def test_fused_mono_kernel_matches_split(rng, protos, T):
    """The FULL single-kernel pipeline (analysis + GSC-RLS + Zelinski +
    synthesis) == spectrum kernel followed by synthesis_half_real_tm."""
    from distant_speech_recognition_tpu.models.adaptive_gsc import (
        GSCRLSConfig,
        gsc_weights,
    )
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        analysis_gsc_rls_zelinski_pallas,
        analysis_gsc_synthesis_pallas,
    )
    from distant_speech_recognition_tpu.ops.filterbank import (
        FilterbankParams,
        synthesis_half_real_tm,
    )
    from distant_speech_recognition_tpu.utils import geometry

    h, g = protos
    M, C, B = 256, 4, 3
    p = FilterbankParams(M=M, m=4, r=1, delay_compensation_type=2)
    x = (rng.standard_normal((B, C, T)) * 1500).astype(np.float32)
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=np.pi / 3)
    wqH, BmH = gsc_weights(M, 16000.0, delays, 1)
    wqH, BmH = np.asarray(wqH), np.asarray(BmH)
    vs = np.asarray(array_manifold(M, 16000.0, delays))
    cfg = GSCRLSConfig(min_frames=4)

    Yp = analysis_gsc_rls_zelinski_pallas(
        jnp.asarray(x), h, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        frame_tile=16, batch_tile=2, interpret=True,
    )
    want = np.asarray(synthesis_half_real_tm(Yp, jnp.asarray(g), p))
    got = np.asarray(analysis_gsc_synthesis_pallas(
        jnp.asarray(x), h, g, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        frame_tile=16, batch_tile=2, interpret=True,
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4 * np.abs(want).max())


def test_fused_analysis_scan_wide_prototype(rng):
    """Regression: prototypes with m*R - 1 > 16 (e.g. M=1024, r=3 -> 31)
    must run through the fused analysis kernels with the pipeline's
    computed frame tile (`fused_frame_tile`) instead of tripping the
    `_fused_prep` halo precondition at the hardcoded default of 16."""
    from distant_speech_recognition_tpu.models.adaptive_gsc import (
        GSCRLSConfig,
        gsc_weights,
    )
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        analysis_gsc_rls_zelinski_pallas,
        fused_frame_tile,
        gsc_rls_zelinski_pallas,
    )
    from distant_speech_recognition_tpu.utils import geometry

    M, C, B, T = 1024, 2, 1, 6144
    p = FilterbankParams(M=M, m=4, r=3, delay_compensation_type=2)
    assert p.m * p.R - 1 == 31 and p.D % 128 == 0
    ft = fused_frame_tile(p)
    assert ft >= 31
    h = (rng.standard_normal(p.m * M) / M).astype(np.float32)
    x = (rng.standard_normal((B, C, T)) * 1500).astype(np.float32)
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=np.pi / 3)
    wqH, BmH = gsc_weights(M, 16000.0, delays, 1)
    wqH, BmH = np.asarray(wqH), np.asarray(BmH)
    vs = np.asarray(array_manifold(M, 16000.0, delays))
    cfg = GSCRLSConfig(min_frames=4)

    Yr = analysis_tm_fused(jnp.asarray(x), jnp.asarray(h), p, packed=True,
                           interpret=True)
    want = np.asarray(gsc_rls_zelinski_pallas(
        Yr, wqH, BmH, vs, cfg, 0.6, 1, 2,
        frame_tile=ft, batch_tile=1, interpret=True,
    ))
    got = np.asarray(analysis_gsc_rls_zelinski_pallas(
        jnp.asarray(x), h, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        frame_tile=ft, batch_tile=1, interpret=True,
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4 * np.abs(want).max())


def _gsc_setup(rng, C=4, B=18, T=5000):
    """Shared fixture math for the paired-mode tests (odd B exercises the
    16-row batch padding)."""
    from distant_speech_recognition_tpu.models.adaptive_gsc import (
        GSCRLSConfig,
        gsc_weights,
    )
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.utils import geometry

    x = (rng.standard_normal((B, C, T)) * 1500).astype(np.float32)
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=np.pi / 3)
    wqH, BmH = gsc_weights(256, 16000.0, delays, 1)
    vs = np.asarray(array_manifold(256, 16000.0, delays))
    return x, np.asarray(wqH), np.asarray(BmH), vs, GSCRLSConfig(min_frames=4)


def test_paired_scan_matches_aligned(rng, protos, monkeypatch):
    """The paired (full-lane-occupancy) kernel + Nyquist side pass ==
    the round-4 aligned kernel, packed-input mode."""
    from distant_speech_recognition_tpu.models import pallas_fused_scan as pfs
    from distant_speech_recognition_tpu.ops.filterbank import FilterbankParams

    h, _ = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=2)
    x, wqH, BmH, vs, cfg = _gsc_setup(rng)
    assert pfs.paired_scan_ok(wqH, BmH, vs)
    Yr = analysis_tm_fused(jnp.asarray(x), jnp.asarray(h), p, packed=True,
                           interpret=True)
    monkeypatch.setattr(pfs, "PAIRED", False)
    want = np.asarray(pfs.gsc_rls_zelinski_pallas(
        Yr, wqH, BmH, vs, cfg, 0.6, 1, 2, interpret=True))
    monkeypatch.setattr(pfs, "PAIRED", True)
    got = np.asarray(pfs.gsc_rls_zelinski_pallas(
        Yr, wqH, BmH, vs, cfg, 0.6, 1, 2, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4 * np.abs(want).max())
    # the Nyquist lane comes from the XLA side pass — check it specifically
    np.testing.assert_allclose(got[:, :, 128], want[:, :, 128],
                               atol=3e-4 * np.abs(want).max())


def test_paired_fused_analysis_matches_aligned(rng, protos, monkeypatch):
    """Paired fused analysis+scan (incl. the aux energy/Nyquist decode) ==
    aligned fused analysis+scan."""
    from distant_speech_recognition_tpu.models import pallas_fused_scan as pfs
    from distant_speech_recognition_tpu.ops.filterbank import FilterbankParams

    h, _ = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=2)
    x, wqH, BmH, vs, cfg = _gsc_setup(rng, B=10, T=4500)
    monkeypatch.setattr(pfs, "PAIRED", False)
    want = np.asarray(pfs.analysis_gsc_rls_zelinski_pallas(
        jnp.asarray(x), h, p, wqH, BmH, vs, cfg, 0.6, 1, 2, interpret=True))
    monkeypatch.setattr(pfs, "PAIRED", True)
    got = np.asarray(pfs.analysis_gsc_rls_zelinski_pallas(
        jnp.asarray(x), h, p, wqH, BmH, vs, cfg, 0.6, 1, 2, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4 * np.abs(want).max())


def test_paired_mono_matches_aligned(rng, protos, monkeypatch):
    """Paired FULL mono kernel (analysis+scan+synthesis) + the linear
    Nyquist synthesis contribution == the aligned mono kernel."""
    from distant_speech_recognition_tpu.models import pallas_fused_scan as pfs
    from distant_speech_recognition_tpu.ops.filterbank import FilterbankParams

    h, g = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=2)
    x, wqH, BmH, vs, cfg = _gsc_setup(rng, B=10, T=4500)
    monkeypatch.setattr(pfs, "PAIRED", False)
    want = np.asarray(pfs.analysis_gsc_synthesis_pallas(
        jnp.asarray(x), h, g, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        interpret=True))
    monkeypatch.setattr(pfs, "PAIRED", True)
    got = np.asarray(pfs.analysis_gsc_synthesis_pallas(
        jnp.asarray(x), h, g, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3 * np.abs(want).max())


def test_synthesis_nyq_contribution_exact(rng, protos):
    """`_synthesis_nyq_tm` == the full fused synthesis run on a packed
    input that is zero everywhere except the Nyquist lane (pins the OLA
    indexing, the first-tile zero-history masks, and the pd shift)."""
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        _synthesis_nyq_tm,
    )
    from distant_speech_recognition_tpu.ops.filterbank import (
        FilterbankParams,
        synthesis_half_real_tm,
    )

    h, g = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=2)
    Tf, B = 40, 3
    ys = rng.standard_normal((Tf, B)).astype(np.float32)
    packed = np.zeros((Tf, B, 256), np.float32)
    packed[:, :, 128] = ys
    want = np.asarray(synthesis_half_real_tm(jnp.asarray(packed),
                                             jnp.asarray(g, jnp.float32), p))
    got = np.asarray(_synthesis_nyq_tm(jnp.asarray(ys), g, p))
    T_out = Tf - p.synthesis_delay
    got_flat = np.moveaxis(got, 0, 1).reshape(B, T_out * p.D)
    assert got_flat.shape == want.shape
    np.testing.assert_allclose(got_flat, want, atol=1e-5 * max(np.abs(want).max(), 1))


def test_paired_ilp_groups(rng, protos, monkeypatch):
    """G=2 ILP groups (two independent 16-row pair-groups per grid step)
    produce the same packed output as G=1 — pins the per-group state
    slicing, the [2G,...] ys/cring scratch wiring, and the aux layout."""
    from distant_speech_recognition_tpu.models import pallas_fused_scan as pfs
    from distant_speech_recognition_tpu.ops.filterbank import FilterbankParams

    h, g = protos
    p = FilterbankParams(M=256, m=4, r=1, delay_compensation_type=2)
    x, wqH, BmH, vs, cfg = _gsc_setup(rng, B=34, T=3500)  # 34 > 32 = G*16
    monkeypatch.setattr(pfs, "PAIRED", True)
    monkeypatch.setattr(pfs, "ILP_GROUPS", 1)
    want = np.asarray(pfs.analysis_gsc_synthesis_pallas(
        jnp.asarray(x), h, g, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        interpret=True))
    monkeypatch.setattr(pfs, "ILP_GROUPS", 2)
    got = np.asarray(pfs.analysis_gsc_synthesis_pallas(
        jnp.asarray(x), h, g, p, wqH, BmH, vs, cfg, 0.6, 1, 2,
        interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


def test_fw_mono_matches_split(rng, protos):
    """The fixed-weight MONO kernel (analysis + wq^H X + Zelinski +
    synthesis in one pallas_call) == the split path
    (zelinski_apply_pallas between the fused filterbank kernels) — the
    BASELINE config-1/2 shape (D&S/SD-MVDR + Zelinski)."""
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.models.pallas_fused_scan import (
        analysis_fw_synthesis_pallas,
        zelinski_apply_pallas,
    )
    from distant_speech_recognition_tpu.ops.filterbank import (
        FilterbankParams,
        synthesis_half_real_tm,
    )
    from distant_speech_recognition_tpu.utils import geometry

    h, g = protos
    M, C, B, T = 256, 4, 3, 5000
    p = FilterbankParams(M=M, m=4, r=1, delay_compensation_type=2)
    x = (rng.standard_normal((B, C, T)) * 1500).astype(np.float32)
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=np.pi / 3)
    vs = np.asarray(array_manifold(M, 16000.0, delays))
    wqH = np.conj(vs)

    Yr = analysis_tm_fused(jnp.asarray(x), jnp.asarray(h), p, packed=True,
                           interpret=True)
    Yp = zelinski_apply_pallas(Yr, wqH, vs, 0.6, 2, 2, interpret=True)
    want = np.asarray(synthesis_half_real_tm(Yp, jnp.asarray(g, jnp.float32), p))
    got = np.asarray(analysis_fw_synthesis_pallas(
        jnp.asarray(x), h, g, p, wqH, vs, 0.6, 2, 2, interpret=True))
    T_out = Yp.shape[0] - p.synthesis_delay
    assert got.shape == (B, T_out * p.D) == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())


def test_wpe_bf16_stats_close_to_f32(rng):
    """Opt-in bf16 WPE lag-stats (PipelineConfig.wpe_bf16_stats): the
    packed-TM WPE chain with bf16 accumulation matmuls stays within a few
    percent of the f32 chain (measured ~3.5% on white noise at T=160 —
    the EM feedback amplifies the operand rounding, which is why the
    feature is strictly opt-in and bench reports the per-run deviation
    next to the speedup; f32 accumulation, only MXU operands are cast)."""
    from distant_speech_recognition_tpu.models.dereverberation import (
        wpe_multichannel_packed_tm,
    )

    Tf, B, C, M = 160, 2, 4, 256
    Yp = (rng.standard_normal((Tf, B, C, M)) * 300).astype(np.float32)
    f32 = np.asarray(wpe_multichannel_packed_tm(
        jnp.asarray(Yp), 129, 2, 6, 2, interpret=True))
    b16 = np.asarray(wpe_multichannel_packed_tm(
        jnp.asarray(Yp), 129, 2, 6, 2, interpret=True, bf16_stats=True))
    rel = np.max(np.abs(b16 - f32)) / np.abs(f32).max()
    assert rel < 6e-2, rel
