"""compat modules convolution/lms/sad/tde/localization/objective_measure:
pull-stream nodes equal the batched kernels they wrap (or a direct numpy
golden of the reference loops)."""

import numpy as np
import jax.numpy as jnp
import pytest

from distant_speech_recognition_tpu.compat import (
    convolution as cconv,
    lms as clms,
    localization as cloc,
    objective_measure as com,
    sad as csad,
    tde as ctde,
)
from distant_speech_recognition_tpu.compat.stream import FeatureStream
from distant_speech_recognition_tpu.models import lti, sad as msad
from distant_speech_recognition_tpu.models import localization as mloc


class _Blocks(FeatureStream):
    """Plays back a 1-D signal in blocks of L (float) or rows of a matrix."""

    def __init__(self, x, L=None):
        x = np.asarray(x)
        if x.ndim == 1:
            assert L is not None
            T = (x.shape[0] // L) * L
            x = x[:T].reshape(-1, L)
        super().__init__(x.shape[1], "blocks")
        self._rows = x

    def _produce(self):
        t = self._frame_no + 1
        if t >= len(self._rows):
            raise StopIteration
        return self._rows[t]

    def _reset(self):
        pass

    def getSampleRate(self):
        return 16000


def test_overlap_add_matches_batched():
    rng = np.random.default_rng(0)
    L, P, T = 64, 17, 640
    x = rng.standard_normal(T).astype(np.float32)
    h = rng.standard_normal(P)

    node = cconv.OverlapAddPtr(_Blocks(x, L), h)
    out = np.concatenate([np.asarray(v) for v in node])

    full = np.asarray(lti.overlap_add_filter(jnp.asarray(x), jnp.asarray(h, jnp.float32)))
    np.testing.assert_allclose(out, full[: out.shape[0]], atol=1e-4)
    # also equals plain convolution
    np.testing.assert_allclose(out, np.convolve(x, h)[: out.shape[0]], atol=1e-4)


def test_overlap_add_explicit_fftlen_validation():
    with pytest.raises(ValueError):
        cconv.OverlapAdd(_Blocks(np.zeros(64, np.float32), 32), np.ones(17), fftLen=32)


def test_overlap_save_matches_convolution():
    rng = np.random.default_rng(1)
    L, P, T = 128, 9, 1024
    x = rng.standard_normal(T).astype(np.float32)
    h = rng.standard_normal(P)

    node = cconv.OverlapSavePtr(_Blocks(x, L), h)
    assert node.size() == L - P
    out = np.concatenate([np.asarray(v) for v in node])

    # frame k emits conv(x)[k*L+P : (k+1)*L] (the linear portion of each
    # L-point circular convolution)
    ref = np.convolve(x, h)
    expected = np.concatenate(
        [ref[k * L + P : (k + 1) * L] for k in range(T // L)]
    )
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_fast_block_lms_matches_batched():
    rng = np.random.default_rng(2)
    N, n_blocks = 32, 20
    x = rng.standard_normal(N * n_blocks).astype(np.float32)
    h_true = rng.standard_normal(8) * 0.5
    d = np.convolve(x, h_true)[: x.shape[0]].astype(np.float32)

    node = clms.FastBlockLMSFeaturePtr(_Blocks(d, N), _Blocks(x, N), alpha=0.05, gamma=0.9)
    errs = []
    for _ in range(n_blocks):
        node.next(node.frame_no() + 1)
        errs.append(node.error().copy())
        node.update()
    err_stream = np.concatenate(errs)

    err_batch, W = lti.fast_block_lms(jnp.asarray(d), jnp.asarray(x), N, alpha=0.05, gamma=0.9)
    np.testing.assert_allclose(err_stream, np.asarray(err_batch), atol=1e-3)
    np.testing.assert_allclose(node.weights(), np.asarray(W), atol=1e-3)


def _spectra(T=40, M=32, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((T, M)) + 1j * rng.standard_normal((T, M))
    return (X * (10.0 + 5.0 * rng.random((T, 1)))).astype(np.complex64)


def test_simple_energy_vad_matches_batched():
    X = _spectra()
    node = csad.SimpleEnergyVADPtr(_Blocks(X), threshold=1.2, gamma=0.9)
    dec_stream = np.array([node.next(t) for t in range(len(X))])
    dec_batch = np.asarray(msad.simple_energy_vad(jnp.asarray(X), 1.2, 0.9))
    np.testing.assert_array_equal(dec_stream, dec_batch)


def test_simple_likelihood_ratio_vad_matches_batched():
    X = _spectra(seed=4)
    var = np.mean(np.abs(X) ** 2, axis=0) * 0.5
    node = csad.SimpleLikelihoodRatioVADPtr(_Blocks(X), threshold=0.9, alpha=0.98)
    with pytest.raises(RuntimeError):
        node.next(0)
    node.set_variance(var)
    dec_stream = np.array([node.next(t) for t in range(len(X))])
    dec_batch = np.asarray(
        msad.simple_likelihood_ratio_vad(jnp.asarray(X), jnp.asarray(var), 0.9, 0.98)
    )
    np.testing.assert_array_equal(dec_stream, dec_batch)


def test_energy_vad_feature_gates_utterance():
    rng = np.random.default_rng(5)
    L = 16
    quiet = 0.01 * rng.standard_normal((30, L))
    loud = 5.0 * rng.standard_normal((20, L))
    blocks = np.concatenate([quiet, loud, quiet[:10]]).astype(np.float32)

    node = csad.EnergyVADFeaturePtr(_Blocks(blocks), threshold=0.5,
                                    bufferLength=4, energiesN=16)
    out = []
    for v in node:
        out.append(np.asarray(v))
    out = np.stack(out)
    # the gate must fire inside the loud region and replay its buffered head
    assert len(out) >= 4
    first = out[0]
    found = any(np.allclose(first, b) for b in blocks)
    assert found
    assert np.mean(np.sum(out**2, axis=1)) > np.mean(np.sum(quiet**2, axis=1))


def test_neural_net_vad_runs():
    rng = np.random.default_rng(6)
    D, c, H = 5, 2, 8
    cep = rng.standard_normal((12, D)).astype(np.float32)
    node = csad.NeuralNetVADPtr(_Blocks(cep), context=c, threshold=0.0)
    node.set_weights(
        rng.standard_normal(((2 * c + 1) * D, H)), rng.standard_normal(H),
        rng.standard_normal((H, 2)), rng.standard_normal(2),
    )
    decisions = [node.next(t) for t in range(len(cep))]
    assert len(decisions) == len(cep) and all(isinstance(d, bool) for d in decisions)


def test_cctde_finds_known_delay():
    rng = np.random.default_rng(7)
    L = 512
    true_lag = 7
    s = rng.standard_normal(4 * L)
    x1 = s[: 2 * L].astype(np.float32)
    x2 = np.roll(s, true_lag)[: 2 * L].astype(np.float32)

    node = ctde.CCTDEPtr(_Blocks(x1, L), _Blocks(x2, L), nHeldMaxCC=3)
    delays = np.asarray(node.next(0))
    # x2 lags x1 by true_lag samples: the PHAT peak sits at +true_lag
    assert node.sample_delays()[0] == true_lag
    np.testing.assert_allclose(delays[0], true_lag / 16000.0, atol=1e-9)
    assert node.cc_values()[0] >= node.cc_values()[1] >= node.cc_values()[2]


def test_gcc_phat_class_matches_batched_kernel():
    rng = np.random.default_rng(8)
    N = 64
    F = N // 2 + 1
    X1 = (rng.standard_normal(F) + 1j * rng.standard_normal(F)).astype(np.complex64)
    X2 = (rng.standard_normal(F) + 1j * rng.standard_normal(F)).astype(np.complex64)

    node = cloc.GCCPhatPtr(sampleRate=16000.0, fftLen=N, nChan=2, pairs=1,
                           interpolate=False)
    node.calculate(X1, 0, X2, 1, 0, timestamp=0.0, sad=True, smooth=False)
    cc_stream = node.getCrossCorrelation()

    cc_batch = np.asarray(
        mloc.gcc_weighted(jnp.asarray(X1)[None], jnp.asarray(X2)[None], N, mode="phat")
    )[0]
    np.testing.assert_allclose(cc_stream, cc_batch, atol=1e-5)

    ret = node.findMaximum()
    d_batch, p_batch = mloc.find_cc_peak(jnp.asarray(cc_batch), 16000.0, interpolate=False)
    np.testing.assert_allclose(ret[0], float(d_batch), atol=1e-9)
    np.testing.assert_allclose(ret[1], float(p_batch), atol=1e-5)


def test_gcc_noise_reduction_variants():
    rng = np.random.default_rng(9)
    N = 32
    F = N // 2 + 1
    node = cloc.GCCGnnSubPtr(sampleRate=16000.0, fftLen=N, nChan=2, pairs=1)
    # feed noise frames (sad=False) to build the noise statistics
    Xn1 = (rng.standard_normal(F) + 1j * rng.standard_normal(F))
    Xn2 = (rng.standard_normal(F) + 1j * rng.standard_normal(F))
    node.calculate(Xn1, 0, Xn2, 1, 0, timestamp=1.0, sad=False)
    Gn = node.getNoiseCrossSpectrum(0)
    np.testing.assert_allclose(Gn, 0.05 * Xn1 * np.conj(Xn2), atol=1e-6)
    np.testing.assert_allclose(node.getNoisePowerSpectrum(0), 0.05 * np.abs(Xn1) ** 2, atol=1e-6)

    X1 = (rng.standard_normal(F) + 1j * rng.standard_normal(F))
    X2 = (rng.standard_normal(F) + 1j * rng.standard_normal(F))
    node.calculate(X1, 0, X2, 1, 0, timestamp=2.0, sad=True, smooth=False)
    expected = np.fft.irfft(X1 * np.conj(X2) - Gn, n=N)
    np.testing.assert_allclose(node.getCrossCorrelation(), expected, atol=1e-6)


def test_gcc_mlr_weighting():
    rng = np.random.default_rng(10)
    N = 32
    F = N // 2 + 1
    X1 = rng.standard_normal(F) + 1j * rng.standard_normal(F)
    X2 = rng.standard_normal(F) + 1j * rng.standard_normal(F)
    node = cloc.GCCMLRRawPtr(sampleRate=16000.0, fftLen=N, nChan=2, pairs=1, q=0.3)
    node.calculate(X1, 0, X2, 1, 0, timestamp=0.0, sad=True, smooth=False)
    q1, q2 = 0.7, 0.6  # q1 = 1-q, q2 = 2q (localization.cc:1220-1221)
    X12, X22 = np.abs(X1) ** 2, np.abs(X2) ** 2
    expected = np.fft.irfft(
        X1 * np.conj(X2) * np.sqrt(X12 * X22) / (q2 * X12 * X22), n=N
    )
    np.testing.assert_allclose(node.getCrossCorrelation(), expected, atol=1e-6)


def test_objective_measure_classes(tmp_path):
    from distant_speech_recognition_tpu.utils.wavio import write_wav
    from distant_speech_recognition_tpu.utils import measures

    rng = np.random.default_rng(11)
    x = (1000.0 * rng.standard_normal(8000)).astype(np.float32)
    y = x + 50.0 * rng.standard_normal(8000).astype(np.float32)
    f1, f2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(f1, x, 16000)
    write_wav(f2, y, 16000)

    x_r, _ = __import__(
        "distant_speech_recognition_tpu.utils.wavio", fromlist=["read_wav"]
    ).read_wav(f1)
    y_r, _ = __import__(
        "distant_speech_recognition_tpu.utils.wavio", fromlist=["read_wav"]
    ).read_wav(f2)

    got = com.SNRPtr().getSNR(f1, f2, com.CC_SCALING)
    expected = measures.snr(np.atleast_2d(x_r)[0], np.atleast_2d(y_r)[0],
                            normalization_option=com.CC_SCALING)
    np.testing.assert_allclose(got, expected, atol=1e-9)
    assert 5.0 < got < 40.0

    seg = com.segmentalSNR().getSegmentalSNR(f1, f2)
    assert 0.0 < seg < 40.0

    ism = com.ItakuraSaitoMeasurePSPtr(fftLen=256, r=1)
    assert ism.frameShiftLength() == 128
    d_same = ism.getDistance(f1, f1)
    d_diff = ism.getDistance(f1, f2)
    assert d_same < 1e-9 and d_diff > d_same


def test_simple_energy_vad_zero_stream_is_nonspeech():
    # reference computes 0/0 = NaN -> non-speech (sad.cc:171-173); must not crash
    X = np.zeros((5, 16), np.complex64)
    node = csad.SimpleEnergyVAD(_Blocks(X), threshold=1.0)
    assert [node.next(t) for t in range(5)] == [False] * 5


def test_likelihood_ratio_vad_second_set_variance_preserves_state():
    X = _spectra(seed=20)
    var = np.mean(np.abs(X) ** 2, axis=0) * 0.5
    node = csad.SimpleLikelihoodRatioVAD(_Blocks(X), threshold=0.9)
    node.set_variance(var)
    node.next(0)
    adapted = node._prev_Ak.copy()
    node.set_variance(var * 2.0)  # re-estimate: must NOT reset prev_Ak
    np.testing.assert_array_equal(node._prev_Ak, adapted)


def test_neural_net_vad_matches_batched_mlpvad():
    from distant_speech_recognition_tpu.models.sad import MLPVad

    rng = np.random.default_rng(21)
    D, c, H, T = 5, 2, 8, 12
    cep = rng.standard_normal((T, D)).astype(np.float32)
    W1 = rng.standard_normal(((2 * c + 1) * D, H)).astype(np.float32)
    b1 = rng.standard_normal(H).astype(np.float32)
    W2 = rng.standard_normal((H, 2)).astype(np.float32)
    b2 = rng.standard_normal(2).astype(np.float32)

    node = csad.NeuralNetVAD(_Blocks(cep), context=c, threshold=0.05)
    node.set_weights(W1, b1, W2, b2)
    stream = [node.next(t) for t in range(T)]

    mlp = MLPVad(W1=W1, b1=b1, W2=W2, b2=b2, threshold=0.05, context=c)
    batched = np.asarray(mlp(jnp.asarray(cep)))
    np.testing.assert_array_equal(np.array(stream), batched)


def test_gcc_accepts_full_length_spectra():
    rng = np.random.default_rng(22)
    N = 32
    # full-fftLen spectra, as the reference requires (localization.cc:1246)
    x1 = np.fft.fft(rng.standard_normal(N))
    x2 = np.fft.fft(rng.standard_normal(N))
    node = cloc.GCCPhat(sampleRate=16000.0, fftLen=N, nChan=2, pairs=1,
                        interpolate=False)
    node.calculate(x1, 0, x2, 1, 0, timestamp=0.0, sad=True, smooth=False)
    expected = np.asarray(
        mloc.gcc_weighted(
            jnp.asarray(x1[: N // 2 + 1])[None], jnp.asarray(x2[: N // 2 + 1])[None],
            N, mode="phat",
        )
    )[0]
    np.testing.assert_allclose(node.getCrossCorrelation(), expected, atol=1e-6)
    # noise statistics also accept (and truncate) full spectra
    node.calculate(x1, 0, x2, 1, 0, timestamp=1.0, sad=False)
    assert node.getNoisePowerSpectrum(0).shape[0] == N // 2 + 1
    assert node.getNoiseCrossSpectrum(0).shape[0] == N // 2 + 1


def test_cctde_rate_mismatch_raises():
    class _Rated(_Blocks):
        def __init__(self, x, L, rate):
            super().__init__(x, L)
            self._r = rate

        def getSampleRate(self):
            return self._r

        def samplerate(self):
            return self._r

    x = np.zeros(1024, np.float32)
    with pytest.raises(ValueError):
        ctde.CCTDE(_Rated(x, 512, 16000), _Rated(x, 512, 44100))
    node = ctde.CCTDE(_Rated(x, 512, 44100), _Rated(x, 512, 44100))
    assert node._samplerate == 44100


def test_overlap_save_nonhermitian_update_uses_lower_half():
    rng = np.random.default_rng(23)
    L = 64
    x = rng.standard_normal(2 * L).astype(np.float32)
    node = cconv.OverlapSave(_Blocks(x, L), np.zeros(4))
    delta = (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    node.update(delta)  # non-hermitian: only bins 0..L/2 act
    out = np.asarray(node.next(0))
    expected = np.fft.irfft(
        np.fft.rfft(x[:L]) * delta[: L // 2 + 1], n=L
    )[4:]
    np.testing.assert_allclose(out, expected, atol=1e-5)


# ---------------------------------------------------------------------------
# plumbing feature nodes (feature.h:325-401, 1044-1498)
# ---------------------------------------------------------------------------


class _RowSource(FeatureStream):
    """Test source replaying fixed rows."""

    def __init__(self, rows):
        rows = np.asarray(rows, np.float32)
        super().__init__(rows.shape[-1], "RowSource")
        self._rows = rows
        self._i = 0

    def _produce(self):
        if self._i >= len(self._rows):
            raise StopIteration
        r = self._rows[self._i]
        self._i += 1
        return r

    def _reset(self):
        self._i = 0


def test_block_size_conversion_reframes(rng):
    from distant_speech_recognition_tpu.compat.feature import BlockSizeConversionFeature

    x = rng.standard_normal(1000).astype(np.float32)
    src = _RowSource(x.reshape(-1, 100))  # 100-sample source frames
    node = BlockSizeConversionFeature(src, block_len=320, shift_len=160)
    frames = [np.asarray(v) for v in node]
    # frame f = samples [f*160, f*160+320)
    want_n = (1000 - 320) // 160 + 1
    assert len(frames) == want_n
    for f, fr in enumerate(frames):
        np.testing.assert_array_equal(fr, x[f * 160 : f * 160 + 320])


def test_mean_subtraction_batch_and_runon(rng):
    from distant_speech_recognition_tpu.compat.feature import MeanSubtractionFeature

    S = rng.standard_normal((30, 6)).astype(np.float32)
    node = MeanSubtractionFeature(_RowSource(S), dev_norm_factor=1.0)
    got = np.stack([np.asarray(v) for v in node])
    mean = S.mean(axis=0)
    var = (S**2).mean(axis=0) - mean**2
    want = (S - mean) / np.sqrt(np.maximum(var, 1e-4))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # runon: running mean with the 0.98 schedule (feature.cc:2499-2540)
    node = MeanSubtractionFeature(_RowSource(S), runon=True)
    got = np.stack([np.asarray(v) for v in node])
    m = np.zeros(6, np.float32)
    want = []
    for t in range(30):
        m = 0.98 * m + 0.02 * S[t]
        want.append(S[t] - m)
    np.testing.assert_allclose(got, np.stack(want), atol=1e-5)


def test_adjacent_matches_batch_splice(rng):
    from distant_speech_recognition_tpu.compat.feature import AdjacentFeature
    from distant_speech_recognition_tpu.models.features import adjacent_splice

    S = rng.standard_normal((12, 4)).astype(np.float32)
    node = AdjacentFeature(_RowSource(S), delta=3)
    got = np.stack([np.asarray(v) for v in node])
    want = np.asarray(adjacent_splice(jnp.asarray(S), 3))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_linear_transform_merge_multimodal_circular(rng):
    from distant_speech_recognition_tpu.compat.feature import (
        CircularStorageFeature,
        LinearTransformFeature,
        MergeFeature,
        MultiModalFeature,
        StaticStorageFeature,
    )

    S = rng.standard_normal((8, 5)).astype(np.float32)
    node = LinearTransformFeature(_RowSource(S), sz=3)
    T = rng.standard_normal((3, 5)).astype(np.float32)
    node.set_matrix(T)
    got = np.stack([np.asarray(v) for v in node])
    np.testing.assert_allclose(got, S @ T.T, atol=1e-5)

    m = MergeFeature(_RowSource(S), _RowSource(2 * S), _RowSource(3 * S))
    got = np.stack([np.asarray(v) for v in m])
    np.testing.assert_allclose(got, np.concatenate([S, 2 * S, 3 * S], axis=1))

    mm = MultiModalFeature(2, 10)
    mm.add_modal_feature(_RowSource(S), 1)
    mm.add_modal_feature(_RowSource(S[:4]), 2)  # refreshed every 2nd frame
    rows = [np.asarray(mm.next()) for _ in range(6)]
    np.testing.assert_allclose(rows[1][5:], rows[0][5:])  # held between updates
    np.testing.assert_allclose(rows[0][:5], S[0])
    np.testing.assert_allclose(rows[2][5:], S[1])  # refreshed at frame 2

    cs = CircularStorageFeature(_RowSource(S), frames_num=3)
    for _ in range(5):
        cs.next()
    np.testing.assert_allclose(np.asarray(cs.next(4)), S[4])  # recent frame
    with pytest.raises(IndexError):
        cs.next(0)  # evicted

    st = StaticStorageFeature(5)
    st.set_frames(S)
    got = np.stack([np.asarray(v) for v in st])
    np.testing.assert_allclose(got, S)
