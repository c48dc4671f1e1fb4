"""Beamformer equivalence tests against per-bin numpy goldens, plus
functional acceptance checks (distortionless response, null steering)."""

import numpy as np
import pytest

import distant_speech_recognition_tpu.models.beamforming as bf
import distant_speech_recognition_tpu.models.adaptive_gsc as ag
from distant_speech_recognition_tpu.utils import geometry

import reference_beamform as ref

FFTLEN = 16
FS = 16000.0
F = FFTLEN // 2 + 1


def _random_snapshots(rng, T=40, C=4):
    X = rng.standard_normal((T, F, C)) + 1j * rng.standard_normal((T, F, C))
    return X.astype(np.complex64)


def test_array_manifold_matches_reference():
    delays = geometry.calc_la_delays(np.arange(4)[:, None] * 50.0, azimuth=0.7)
    vs = np.asarray(bf.array_manifold(FFTLEN, FS, delays))
    for f in range(F):
        golden = ref.calc_array_manifold_f(f, FFTLEN, FS, delays)
        np.testing.assert_allclose(vs[f], golden, atol=1e-6)


def test_blocking_matrix_matches_and_nulls(rng):
    delays = geometry.calc_la_delays(np.arange(4)[:, None] * 50.0, azimuth=1.2)
    vs = np.asarray(bf.array_manifold(FFTLEN, FS, delays)).astype(np.complex128)
    B = np.asarray(bf.blocking_matrix(vs, Nc=1))
    for f in range(F):
        golden = ref.calc_blocking_matrix(vs[f], Nc=1)
        np.testing.assert_allclose(B[f], golden, atol=1e-5)
        # the defining property: vs^T B = 0
        np.testing.assert_allclose(vs[f] @ B[f], 0, atol=1e-5)
        # orthonormal columns
        np.testing.assert_allclose(
            np.conj(B[f]).T @ B[f], np.eye(3), atol=1e-5
        )


def test_delay_and_sum_distortionless(rng):
    """A plane wave from the look direction passes with unit gain."""
    delays = geometry.calc_la_delays(np.arange(4)[:, None] * 50.0, azimuth=0.5)
    wqH = np.asarray(bf.delay_and_sum_weights(FFTLEN, FS, delays))
    vs = np.asarray(bf.array_manifold(FFTLEN, FS, delays))
    # X = manifold * C * s  (a unit plane wave across the array)
    s = rng.standard_normal(F) + 1j * rng.standard_normal(F)
    X = (vs * 4 * s[:, None])[None]  # [1, F, C]
    Y = np.asarray(bf.apply_weights(wqH.astype(np.complex64), X.astype(np.complex64)))
    np.testing.assert_allclose(Y[0], s, atol=1e-5)


def test_lcmv_null_steering():
    """LCMV places a null on the jammer and unity on the target."""
    mpos = np.arange(4)[:, None] * 50.0
    d_t = geometry.calc_la_delays(mpos, azimuth=0.4)
    d_j = geometry.calc_la_delays(mpos, azimuth=2.0)
    vs_t = np.asarray(bf.array_manifold(FFTLEN, FS, d_t))
    vs_j = np.asarray(bf.array_manifold(FFTLEN, FS, d_j))
    constraints = np.stack([vs_t, vs_j], axis=1)  # [F, 2, C]
    wqH = np.asarray(bf.lcmv_weights(constraints, np.array([1.0, 0.0])))
    for f in range(1, F - 1):
        # w^H d_t = 1 (g scaled by the 1/C in vs), w^H d_j = 0
        np.testing.assert_allclose(wqH[f] @ vs_t[f], 1.0, atol=1e-4)
        np.testing.assert_allclose(wqH[f] @ vs_j[f], 0.0, atol=1e-4)


def test_mvdr_weights_match_reference(rng):
    delays = geometry.calc_la_delays(np.arange(4)[:, None] * 50.0, azimuth=0.9)
    vs = np.asarray(bf.array_manifold(FFTLEN, FS, delays)).astype(np.complex128)
    R = np.asarray(bf.diffuse_noise_coherence(np.c_[np.arange(4) * 50.0, np.zeros((4, 2))], FFTLEN, FS)).astype(
        np.complex128
    )
    R = R + 0.01 * np.eye(4)
    golden = np.conjugate(ref.mvdr_weights_ref(R, vs))
    ours = np.asarray(bf.mvdr_weights(R.astype(np.complex64), vs.astype(np.complex64)))
    np.testing.assert_allclose(ours, golden, atol=2e-4)
    # distortionless: w^H d = 1/C  (d = vs includes the 1/C factor)
    for f in range(1, F):
        np.testing.assert_allclose(ours[f] @ vs[f], 1.0 / 4, atol=1e-4)


def test_superdirective_runs():
    mpos = np.c_[np.arange(4) * 50.0, np.zeros((4, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=1.0)
    wqH = np.asarray(bf.superdirective_weights(mpos, delays, FFTLEN, FS))
    assert wqH.shape == (F, 4)
    assert np.all(np.isfinite(wqH))


def test_sos_accumulation_matches_loop(rng):
    X = _random_snapshots(rng, T=30)
    mask = (rng.random(30) > 0.5).astype(np.float64)
    R, counts = bf.accumulate_sos(X, mask)
    R, counts = np.asarray(R), np.asarray(counts)
    golden = np.zeros((F, 4, 4), complex)
    for t in range(30):
        if mask[t] > 0:
            for f in range(F):
                golden[f] += np.outer(X[t, f], np.conjugate(X[t, f]))
    np.testing.assert_allclose(R, golden, rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(counts, np.full(F, mask.sum()), atol=1e-5)


def test_blind_mvdr_matches_loop(rng):
    X = _random_snapshots(rng, T=60)
    tmask = (rng.random(60) > 0.6).astype(np.float64)
    nmask = 1.0 - tmask
    Rt, ct = [np.asarray(a) for a in bf.accumulate_sos(X, tmask)]
    Rn, cn = [np.asarray(a) for a in bf.accumulate_sos(X, nmask)]
    Rt = (Rt / ct[:, None, None]).astype(np.complex128)
    Rn = np.asarray(
        bf.improve_matrix_condition((Rn / cn[:, None, None]).astype(np.complex128), 1e-6)
    )
    ours = np.asarray(bf.blind_mvdr_weights(Rt, Rn, ref_micx=0, offset=0.0))
    u = np.zeros(4); u[0] = 1.0
    for f in range(F):
        no = np.linalg.inv(Rn[f]) @ Rt[f]
        golden = np.conjugate(no @ u / np.trace(no))
        np.testing.assert_allclose(ours[f], golden, rtol=1e-3, atol=1e-4)


def test_gev_weights_match_reference(rng):
    X = _random_snapshots(rng, T=80)
    # build PSD covariance pencils
    tmask = (rng.random(80) > 0.5).astype(np.float64)
    Rt, _ = [np.asarray(a) for a in bf.accumulate_sos(X, tmask)]
    Rn, cn = [np.asarray(a) for a in bf.accumulate_sos(X, 1.0 - tmask)]
    Rn = Rn / cn[:, None, None]
    Rn = np.asarray(bf.improve_matrix_condition(Rn.astype(np.complex128), 1e-6))
    Rn = Rn / (np.trace(Rn, axis1=-2, axis2=-1)[:, None, None].real / 4)
    Rt = Rt.astype(np.complex128)

    golden = ref.gev_weights_ref(Rt, Rn)
    ours = np.asarray(bf.gev_weights(Rt, Rn))
    # eigenvectors match up to a global phase per utterance; compare after
    # aligning the first bin's phase
    for f in range(F):
        phase = np.exp(1j * np.angle(np.vdot(ours[f], golden[f])))
        np.testing.assert_allclose(ours[f] * phase, golden[f], atol=2e-4)
        # max-SNR property: w maximizes target/noise Rayleigh quotient
    # beamformer normalization: v^H Rn v = 1
    w = np.conjugate(ours)
    for f in range(F):
        np.testing.assert_allclose(np.conj(w[f]) @ Rn[f] @ w[f], 1.0, atol=1e-3)


@pytest.mark.parametrize("kind", ["lms", "rls"])
def test_adaptive_gsc_matches_reference(kind, rng):
    T, C = 50, 4
    delays = geometry.calc_la_delays(np.arange(C)[:, None] * 50.0, azimuth=0.8)
    wqH, BmH = ag.gsc_weights(FFTLEN, FS, delays)
    wqH, BmH = np.asarray(wqH), np.asarray(BmH)
    X = _random_snapshots(rng, T=T, C=C) * 40.0
    energy = np.sum(np.abs(X) ** 2, axis=(1, 2)) / FFTLEN

    if kind == "lms":
        cfg = ag.GSCLMSConfig(min_frames=10, slowdown_after=16, sil_thresh=1e8,
                              init_diagonal_load=1e2, energy_floor=1e-2)
        golden, golden_wa = ref.gsc_lms_ref(
            X.astype(np.complex128), energy, wqH, BmH, cfg
        )
        ours, state = ag.gsc_lms(X, energy, wqH.astype(np.complex64), BmH.astype(np.complex64), cfg)
    else:
        cfg = ag.GSCRLSConfig(min_frames=10, sil_thresh=1e8, init_diagonal_load=1e2,
                              alpha2=10.0, max_wa_l2norm=100.0)
        golden, golden_wa = ref.gsc_rls_ref(
            X.astype(np.complex128), energy, wqH, BmH, cfg
        )
        ours, state = ag.gsc_rls(X, energy, wqH.astype(np.complex64), BmH.astype(np.complex64), cfg)

    ours = np.asarray(ours)
    assert ours.shape == golden.shape
    scale = np.abs(golden).max()
    np.testing.assert_allclose(ours / scale, golden / scale, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.waH), golden_wa, atol=2e-3)


def test_mmi_binary_masking_suppresses_interferer(rng):
    """Two sources from different directions; MMI masking recovers the
    target's bins and suppresses interferer-dominated ones."""
    from distant_speech_recognition_tpu.models import mmi

    mpos = np.arange(4)[:, None] * 50.0
    d_t = geometry.calc_la_delays(mpos, azimuth=0.5)
    d_j = geometry.calc_la_delays(mpos, azimuth=2.2)
    vs_t = np.asarray(bf.array_manifold(FFTLEN, FS, d_t))
    vs_j = np.asarray(bf.array_manifold(FFTLEN, FS, d_j))

    T = 50
    # disjoint activity: target in even frames, jammer in odd
    s = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))) * (np.arange(T) % 2 == 0)[:, None]
    n = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))) * (np.arange(T) % 2 == 1)[:, None]
    X = (vs_t[None] * 4 * s[..., None] + vs_j[None] * 4 * n[..., None]).astype(np.complex64)

    wqH = np.stack([np.conj(vs_t), np.conj(vs_j)]).astype(np.complex64)
    out = np.asarray(mmi.subband_mmi(X, wqH, target=0))
    # jammer-only frames almost fully masked; target frames preserved
    jam_frames = np.abs(out[1::2]).mean()
    tgt_frames = np.abs(out[0::2]).mean()
    assert jam_frames < 0.15 * tgt_frames, (jam_frames, tgt_frames)


@pytest.mark.parametrize("kind", ["lms", "rls"])
def test_fused_gsc_zelinski_matches_sequential(kind, rng):
    """The single-scan fused GSC+Zelinski equals the two-stage composition."""
    from distant_speech_recognition_tpu.models import postfilter as pfm

    T, C = 40, 4
    delays = geometry.calc_la_delays(np.arange(C)[:, None] * 50.0, azimuth=0.8)
    wqH, BmH = ag.gsc_weights(FFTLEN, FS, delays)
    wqH, BmH = np.asarray(wqH).astype(np.complex64), np.asarray(BmH).astype(np.complex64)
    wqm = np.conj(np.asarray(bf.array_manifold(FFTLEN, FS, delays))).astype(np.complex64)
    X = _random_snapshots(rng, T=T, C=C) * 40.0
    energy = np.sum(np.abs(X) ** 2, axis=(1, 2)) / FFTLEN

    if kind == "lms":
        cfg = ag.GSCLMSConfig(min_frames=10, slowdown_after=16, init_diagonal_load=1e2,
                              energy_floor=1e-2)
        Y, _ = ag.gsc_lms(X, energy, wqH, BmH, cfg)
    else:
        cfg = ag.GSCRLSConfig(min_frames=10, init_diagonal_load=1e2)
        Y, _ = ag.gsc_rls(X, energy, wqH, BmH, cfg)
    want = np.asarray(pfm.zelinski_postfilter(X, Y, wqm, 0.6, 1, 3))

    got = np.asarray(
        ag.gsc_postfilter_fused(X, energy, wqH, BmH, wqm, kind, cfg, 0.6, 1, 3)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fir_export_and_weight_io(tmp_path, rng):
    """FIR export: filtering with the exported FIRs approximates the
    subband beamformer's frequency response."""
    delays = geometry.calc_la_delays(np.arange(4)[:, None] * 50.0, azimuth=0.6)
    wqH = np.asarray(bf.delay_and_sum_weights(64, FS, delays)).astype(np.complex64)
    fir = np.asarray(bf.weights_to_fir(wqH))
    assert fir.shape == (4, 64)
    # frequency response of the FIR at bin k matches the (shifted) weight
    H = np.fft.fft(fir / np.hamming(64)[None], axis=-1)  # undo window
    k = np.arange(33)
    shift = np.exp(1j * np.pi * (k + 1.0))
    # the Nyquist bin's imaginary residue is dropped by the real-FIR export
    # (the reference prints only real coefficients too) — compare below it
    np.testing.assert_allclose(H[:, :32].T, (wqH * shift[:, None])[:32], atol=1e-4)

    p = str(tmp_path / "w.npz")
    bf.save_weights(p, wqH=wqH, fir=fir)
    back = bf.load_weights(p)
    np.testing.assert_allclose(back["wqH"], wqH)


def _binary_masking_golden(Yt, Yi, Ycmp, avg_factor, fwidth):
    """Numpy transliteration of SubbandMMI::binary_masking_ +
    getMeanOfSubbandC + set_averaged_output_ (beamformer.cc:2160-2278),
    non-halfBandShift branch, bins 1..F-1 of the half spectrum."""
    T, F = Yt.shape
    out = Yt.copy()
    avg = np.zeros(F, np.complex128)

    def mean_of(fb):
        if fwidth <= 1:
            return avg[fb]
        # the reference passes fftLen/2 (= F-1) as the length, so the window
        # clamps to bins 1..F-2 (beamformer.cc:2178-2184,2257)
        s = max(fb - fwidth // 2, 1)
        e = min(fb + fwidth // 2, F - 2)
        return avg[s : e + 1].mean()

    for t in range(T):
        for f in range(1, F):
            tgt_pow = abs(Ycmp[t, f]) ** 2
            max_pow = np.max(np.abs(Yi[t, f]) ** 2)
            new_val = avg_factor * mean_of(f) if avg_factor >= 0 else 0.0
            if tgt_pow < max_pow:
                out[t, f] = new_val
                if avg_factor >= 0:
                    avg[f] = new_val
            else:
                if avg_factor >= 0:
                    avg[f] = avg_factor * avg[f] + (1 - avg_factor) * out[t, f]
    return out


@pytest.mark.parametrize("upper_branch", [False, True])
@pytest.mark.parametrize("avg_factor,fwidth", [(-1.0, 1), (0.4, 1), (0.4, 5)])
def test_mmi_binary_masking_matches_cpp_golden(rng, upper_branch, avg_factor, fwidth):
    from distant_speech_recognition_tpu.models import mmi

    T, F, C, S = 12, 9, 4, 2
    M = 2 * (F - 1)
    X = (rng.standard_normal((T, F, C)) + 1j * rng.standard_normal((T, F, C))).astype(np.complex64)
    wqH = np.asarray(
        [bf.array_manifold(M, 16000.0, rng.uniform(-1e-4, 1e-4, C)) for _ in range(S)]
    ).conj().astype(np.complex64)

    out = np.asarray(
        mmi.subband_mmi(
            X, wqH, target=0,
            avg_factor=avg_factor, fwidth=fwidth,
            mask_with_upper_branch=upper_branch,
        )
    )

    Y_all = np.einsum("sfc,tfc->tfs", np.asarray(wqH), X)  # wl = None
    Yt = Y_all[..., 0].astype(np.complex128)
    Yi = Y_all[..., 1:]
    Ycmp = Yt  # with wl=None the upper branch IS the full output
    golden = _binary_masking_golden(Yt.copy(), Yi, Ycmp, avg_factor, fwidth)
    np.testing.assert_allclose(out, golden, atol=2e-5)
