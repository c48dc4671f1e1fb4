"""Tests for the MFCC chain, Kaldi ark I/O, objective measures, and LTI ops."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import features as ft
from distant_speech_recognition_tpu.models import lti
from distant_speech_recognition_tpu.utils import kaldi_io, measures


def test_frame_and_preemphasis_golden(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    frames = np.asarray(ft.frame_signal(x, 320, 160))
    assert frames.shape == (-(-1000 // 160), 320)
    np.testing.assert_allclose(frames[0], x[:320], atol=0)
    # preemphasis: golden streaming loop with carried prior
    pe = np.asarray(ft.preemphasis(frames, 0.95))
    prior = 0.0
    for t in range(3):
        for i in range(320):
            want = frames[t, i] - 0.95 * prior
            assert abs(pe[t, i] - want) < 1e-5
            prior = frames[t, i]


def test_mel_matrix_properties():
    M = ft.mel_matrix(256, 16000.0, 100.0, 6800.0, 30)
    assert M.shape == (30, 256)
    assert (M >= -0.01).all()  # tiny negative edge weights from the reference quirk
    # every filter has support, centers increase
    assert (M.sum(axis=1) > 0).all()
    centers = M.argmax(axis=1)
    assert (np.diff(centers) > 0).all()


def test_mfcc_end_to_end(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    cep = np.asarray(ft.mfcc(x))
    assert cep.shape[1] == 13
    assert np.isfinite(cep).all()
    # CMN: means ~ 0
    np.testing.assert_allclose(cep.mean(axis=0), 0.0, atol=1e-4)


def test_dct_matrices():
    for t in (0, 1, 2):
        C = ft.dct_matrix(13, 30, t)
        assert C.shape == (13, 30)
    C1 = ft.dct_matrix(13, 30, 1)
    np.testing.assert_allclose(C1[0], np.ones(30))


def test_adjacent_splice(rng):
    x = rng.standard_normal((10, 3)).astype(np.float32)
    out = np.asarray(ft.adjacent_splice(x, 2))
    assert out.shape == (10, 15)
    np.testing.assert_allclose(out[5, 6:9], x[5])  # center block
    np.testing.assert_allclose(out[0, 0:3], x[0])  # edge padding


def test_kaldi_feat_ark_roundtrip(tmp_path, rng):
    utts = {"utt1": rng.standard_normal((5, 13)).astype(np.float32),
            "utt2": rng.standard_normal((3, 13)).astype(np.float32)}
    p = str(tmp_path / "t.feat.ark")
    kaldi_io.write_feat_ark(p, utts)
    back = dict(kaldi_io.read_feat_ark(p))
    assert set(back) == {"utt1", "utt2"}
    np.testing.assert_allclose(back["utt1"], utts["utt1"], atol=1e-6)


def test_kaldi_wav_and_intvec_roundtrip(tmp_path, rng):
    w = (rng.standard_normal(1000) * 1000).astype(np.int16)
    p = str(tmp_path / "t.wav.ark")
    kaldi_io.write_wav_ark(p, {"u": w}, samplerate=16000)
    uttid, samples, rate = next(kaldi_io.read_wav_ark(p))
    assert uttid == "u" and rate == 16000
    np.testing.assert_array_equal(samples, w)

    iv = np.array([1, 5, 2, 9], np.int32)
    p2 = str(tmp_path / "t.iv.ark")
    kaldi_io.write_int_vector_ark(p2, {"u": iv})
    uttid, vec = next(kaldi_io.read_int_vector_ark(p2))
    np.testing.assert_array_equal(vec, iv)


def test_snr_measures(rng):
    x = rng.standard_normal(8000)
    noise = 0.1 * rng.standard_normal(8000)
    val = measures.snr(x, x + noise)
    assert 15 < val < 25  # ~20 dB
    assert measures.snr(x, 2.0 * x) > 100  # gain-normalized
    sseg = measures.segmental_snr(x, x + noise)
    assert 10 < sseg < 35
    assert measures.itakura_saito(np.abs(x[:100]) + 1, np.abs(x[:100]) + 1) < 1e-10


def test_overlap_add_save_match_direct(rng):
    x = rng.standard_normal(500).astype(np.float32)
    h = rng.standard_normal(31).astype(np.float32)
    want = np.convolve(x, h)
    oa = np.asarray(lti.overlap_add_filter(x, h))
    np.testing.assert_allclose(oa, want, atol=1e-3)
    os_ = np.asarray(lti.overlap_save_filter(x, h))
    np.testing.assert_allclose(os_, want[:500], atol=1e-3)


def test_fast_block_lms_identifies_filter(rng):
    T = 16384
    x = rng.standard_normal(T).astype(np.float32)
    h = np.zeros(32, np.float32); h[3] = 1.0; h[10] = -0.5
    d = np.convolve(x, h)[:T].astype(np.float32)
    err, W = lti.fast_block_lms(d, x, block_len=64, alpha=0.5, gamma=0.9)
    err = np.asarray(err)
    head = np.mean(err[:2000] ** 2)
    tail = np.mean(err[-2000:] ** 2)
    assert tail < 0.05 * head, (head, tail)


def test_spectral_resampling_and_vtln(rng):
    p = np.abs(rng.standard_normal((4, 64))).astype(np.float32)
    out = np.asarray(ft.spectral_resampling(p, 1.0))
    np.testing.assert_allclose(out, p, atol=1e-5)  # unit ratio = identity
    warped = np.asarray(ft.vtln(p, ratio=1.0, edge=0.8))
    np.testing.assert_allclose(warped.sum(-1), p.sum(-1), rtol=1e-4)  # energy kept
    warped2 = np.asarray(ft.vtln(p, ratio=1.2, edge=0.8))
    assert np.isfinite(warped2).all() and warped2.shape == p.shape


def test_samplerate_conversion(rng):
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(ft.samplerate_conversion(x, 16000, 8000))
    assert abs(len(y) - 8000) <= 2
    # tone frequency preserved
    f = np.fft.rfftfreq(len(y), 1 / 8000.0)
    peak = f[np.abs(np.fft.rfft(y)).argmax()]
    assert abs(peak - 440) < 5


def test_alog_feature_offline_and_runon():
    """ALog additive-log compression vs a per-frame transliteration of
    ALogFeature (feature.cc find_min_max_/next)."""
    import jax.numpy as jnp
    from distant_speech_recognition_tpu.models.features import alog_feature

    rng = np.random.default_rng(4)
    x = rng.standard_normal((12, 5)).astype(np.float32) * 3.0
    m, a = 1.5, 4.0

    def golden(runon):
        out = np.zeros_like(x)
        mx = -np.inf
        gmax = x.max()
        for t in range(x.shape[0]):
            mx = max(mx, x[t].max())
            b = (mx if runon else gmax) / 10.0**a
            val = b + x[t]
            val = np.where(val <= 0.0, 1.0, val)
            out[t] = m * np.log10(val)
        return out

    np.testing.assert_allclose(
        np.asarray(alog_feature(jnp.asarray(x), m, a, runon=False)), golden(False), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(alog_feature(jnp.asarray(x), m, a, runon=True)), golden(True), rtol=1e-5
    )


def test_snr_normalization_flags(rng):
    """calcSNR bit-flag normalizations (objective_measure.cc:42-160)."""
    x = rng.standard_normal(4000)
    # STDV scaling makes SNR invariant to a pure gain
    v1 = measures.snr(x, 3.0 * x, normalization_option=measures.STDV_SCALING)
    assert v1 > 100
    # MEAN normalization removes DC offsets
    v2 = measures.snr(x, x + 5.0,
                      normalization_option=measures.MEAN_NORMALIZATION)
    assert v2 > 100
    # CC scaling == default normalize=True
    noise = 0.1 * rng.standard_normal(4000)
    assert measures.snr(x, x + noise) == measures.snr(
        x, x + noise, normalization_option=measures.CC_SCALING)


def test_itakura_saito_frames_and_quality_cli(tmp_path, rng):
    """quality_assessment tool end-to-end (src/quality_assessment.cc)."""
    from distant_speech_recognition_tpu.tools import quality_assessment
    from distant_speech_recognition_tpu.utils.wavio import write_wav

    fs = 16000
    t = np.arange(fs) / fs
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = x + 0.01 * rng.standard_normal(fs).astype(np.float32)
    f1, f2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(f1, x, fs)
    write_wav(f2, y, fs)
    snr_db, is_dist = quality_assessment.run(f1, f2, M=64, r=1)
    assert snr_db > 20
    # a pure tone has ~zero power in most bins, so broadband noise gives a
    # large (but finite) IS distance
    assert 0 <= is_dist < 100
    # identical files: IS distance ~0, huge SNR
    snr_same, is_same = quality_assessment.run(f1, f1, M=64, r=1)
    assert is_same < 1e-6 and snr_same > 80


def test_log_power_extractor_tool(tmp_path):
    """tools/log_power_extractor mirrors unit_test/log_power_extractor.py:
    whole-block framing, Hamming, FFT power, log, pickled frame sequence."""
    import pickle

    from distant_speech_recognition_tpu.tools import log_power_extractor

    out = str(tmp_path / "lp.pickle")
    logp = log_power_extractor.run(
        "/root/reference/btk20_src/unit_test/data/speech_at_20sec.wav", out,
        D=160, fft_len=256,
    )
    assert logp.shape[1] == 129 and np.isfinite(logp).all()
    frames = []
    with open(out, "rb") as fp:
        while True:
            try:
                frames.append(pickle.load(fp))
            except EOFError:
                break
    assert len(frames) == logp.shape[0]
    np.testing.assert_allclose(np.asarray(frames), logp, rtol=1e-6)
