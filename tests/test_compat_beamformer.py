"""compat.beamformer: the C++ ``btk20.beamformer`` stream classes.

Each test drives the pull-stream node on synthetic subband frames and
compares against either the batched kernels (models/beamforming.py) or a
direct numpy transliteration of the reference's per-bin loops
(beamformer.cc), written here from the C++ sources.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from distant_speech_recognition_tpu.compat import beamformer as cb
from distant_speech_recognition_tpu.compat.stream import FeatureStream
from distant_speech_recognition_tpu.models import beamforming as bf
from distant_speech_recognition_tpu.ops.filterbank import hermitian_mirror

M = 16
F = M // 2 + 1
C = 4
T = 12
FS = 16000.0


class _SrcStream(FeatureStream):
    """Plays back precomputed full-M subband frames [T, M]."""

    def __init__(self, frames: np.ndarray):
        super().__init__(frames.shape[1], "src")
        self._frames = frames

    def _produce(self):
        t = self._frame_no + 1
        if t >= len(self._frames):
            raise StopIteration
        return self._frames[t]

    def _reset(self):
        pass


def _subband_frames(seed=0):
    """Hermitian-consistent per-channel spectra [C, T, M] + snapshots [T, F, C]."""
    rng = np.random.default_rng(seed)
    half = rng.standard_normal((C, T, F)) + 1j * rng.standard_normal((C, T, F))
    half[..., 0] = half[..., 0].real
    half[..., -1] = half[..., -1].real
    full = np.asarray(hermitian_mirror(jnp.asarray(half), M)).astype(np.complex64)
    X = half.transpose(1, 2, 0).astype(np.complex64)  # [T, F, C]
    return full, X


def _delays(seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, C) * 1e-4


def _drive(node, frames_full):
    for ch in range(C):
        node.set_channel(_SrcStream(frames_full[ch]))
    return np.stack([np.asarray(v) for v in node], axis=0)  # [T, M]


def test_subband_ds_matches_batch():
    frames_full, X = _subband_frames()
    delays = _delays()

    ds = cb.SubbandDSPtr(fftLen=M)
    ds.calc_array_manifold_vectors(FS, delays)
    out = _drive(ds, frames_full)

    wqH = np.asarray(bf.delay_and_sum_weights(M, FS, delays))
    Y = np.einsum("fc,tfc->tf", wqH, X)
    expected = np.asarray(hermitian_mirror(jnp.asarray(Y), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=1e-5)
    assert ds.chanN() == C and ds.fftLen2() == M // 2


def test_subband_ds_lcmv_null_steering():
    frames_full, X = _subband_frames(3)
    delays_t, delays_j = _delays(1), _delays(2)

    ds = cb.SubbandDS(fftLen=M)
    ds.calc_array_manifold_vectors_2(FS, delays_t, delays_j)
    out = _drive(ds, frames_full)

    vs_t = bf.array_manifold(M, FS, delays_t)
    vs_j = bf.array_manifold(M, FS, delays_j)
    wqH = np.asarray(
        bf.lcmv_weights(jnp.stack([vs_t, vs_j], axis=-2), jnp.asarray([1.0, 0.0]))
    )
    Y = np.einsum("fc,tfc->tf", wqH, X)
    expected = np.asarray(hermitian_mirror(jnp.asarray(Y), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=1e-5)


def test_subband_gsc_packed_active_weights():
    frames_full, X = _subband_frames(4)
    delays = _delays()
    rng = np.random.default_rng(7)

    gsc = cb.SubbandGSCPtr(fftLen=M)
    gsc.calc_gsc_weights(FS, delays)
    wa = (rng.standard_normal((F, C - 1)) + 1j * rng.standard_normal((F, C - 1))) * 0.1
    for f in range(F):
        packed = np.stack([wa[f].real, wa[f].imag], axis=-1).reshape(-1)
        gsc.set_active_weights_f(f, packed)
    out = _drive(gsc, frames_full)

    wq = np.asarray(bf.array_manifold(M, FS, delays))
    B = np.asarray(bf.blocking_matrix(jnp.asarray(wq), Nc=1))
    wl = np.einsum("fcb,fb->fc", B, wa)
    w = wq - wl
    Y = np.einsum("fc,tfc->tf", np.conj(w), X)
    Y[:, 0] = np.einsum("c,tc->t", np.conj(wq[0]), X[:, 0])  # bin 0: wq^H X only
    expected = np.asarray(hermitian_mirror(jnp.asarray(Y), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=1e-4)

    # v^T B = 0 orthogonality of the blocking matrix (calc_blocking_matrix_)
    np.testing.assert_allclose(
        np.einsum("fc,fcb->fb", wq, B), 0, atol=1e-6
    )


def test_subband_gsc_normalize_weight():
    frames_full, X = _subband_frames(5)
    delays = _delays()

    gsc = cb.SubbandGSC(fftLen=M)
    gsc.calc_gsc_weights(FS, delays)
    gsc.normalize_weight(True)
    out = _drive(gsc, frames_full)

    wq = np.asarray(bf.array_manifold(M, FS, delays))  # wl = 0
    nrm = np.linalg.norm(wq, axis=-1, keepdims=True)
    w = wq / (nrm * C)
    Y = np.einsum("fc,tfc->tf", np.conj(w), X)
    Y[:, 0] = np.einsum("c,tc->t", np.conj(wq[0]), X[:, 0])
    expected = np.asarray(hermitian_mirror(jnp.asarray(Y), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=1e-5)


def _gscrls_golden(X, wq, B, mu, sigma2_load, Pz0, qctype, alpha):
    """Direct numpy transliteration of SubbandGSCRLS::next +
    update_active_weight_vector2_ (beamformer.cc:1504-1645)."""
    Tn, Fn, Cn = X.shape
    Bc = B.shape[-1]
    wa = np.zeros((Fn, Bc), np.complex128)
    Pz = np.array([Pz0.copy() for _ in range(Fn)])
    out = np.zeros((Tn, Fn), np.complex128)
    for t in range(Tn):
        wl = np.einsum("fcb,fb->fc", B, wa)
        # output with current weights (calc_gsc_output per bin >= 1)
        for f in range(Fn):
            if f == 0:
                out[t, f] = np.vdot(wq[0], X[t, 0])
            else:
                out[t, f] = np.vdot(wq[f] - wl[f], X[t, f])
        # update (bins 1..M/2)
        for f in range(1, Fn):
            Z = np.conj(B[f]).T @ X[t, f]
            PzH_Z = np.conj(Pz[f]).T @ Z
            de = np.vdot(PzH_Z, Z) / mu + 1.0
            gz = (Pz[f] @ Z / mu) / de
            Pz[f] = (Pz[f] - np.outer(gz, np.conj(PzH_Z))) / mu
            epA = np.conj(out[t, f])
            mat1 = np.eye(Bc) - sigma2_load * Pz[f]
            wa_f = mat1 @ wa[f] + gz * epA
            if qctype == cb.CONSTANT_NORM:
                wa_f = wa_f * (alpha / np.linalg.norm(wa_f))
            elif qctype == cb.THRESHOLD_LIMITATION:
                nrm = np.linalg.norm(wa_f)
                if nrm * nrm >= alpha:
                    wa_f = wa_f * (alpha / nrm)
            wa[f] = wa_f
    return out


@pytest.mark.parametrize(
    "qctype,alpha,sigma2_load",
    [
        (cb.NO_QUADRATIC_CONSTRAINT, -1.0, 0.0),
        (cb.THRESHOLD_LIMITATION, 0.5, 0.01),
        (cb.CONSTANT_NORM, 0.3, 0.0),
    ],
)
def test_subband_gscrls_matches_cpp_golden(qctype, alpha, sigma2_load):
    frames_full, X = _subband_frames(8)
    delays = _delays()

    rls = cb.SubbandGSCRLSPtr(fftLen=M, mu=0.95, sigma2=sigma2_load)
    rls.calc_gsc_weights(FS, delays)
    rls.init_precision_matrix(0.02)
    if qctype != cb.NO_QUADRATIC_CONSTRAINT:
        rls.set_quadratic_constraint(alpha, qctype)
    out = _drive(rls, frames_full)

    wq = np.asarray(bf.array_manifold(M, FS, delays)).astype(np.complex128)
    B = np.asarray(bf.blocking_matrix(jnp.asarray(wq), Nc=1)).astype(np.complex128)
    Pz0 = np.eye(C - 1, dtype=np.complex128) / 0.02
    golden = _gscrls_golden(
        X.astype(np.complex128), wq, B, 0.95, sigma2_load, Pz0, qctype, alpha
    )
    expected = np.asarray(hermitian_mirror(jnp.asarray(golden), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=2e-3)


def test_subband_gscrls_frozen_weights():
    frames_full, X = _subband_frames(9)
    delays = _delays()

    rls = cb.SubbandGSCRLS(fftLen=M)
    rls.calc_gsc_weights(FS, delays)
    rls.init_precision_matrix(0.01)
    rls.update_active_weight_vecotrs(False)  # [sic]
    out = _drive(rls, frames_full)

    # frozen wa = 0 -> identical to plain D&S
    wqH = np.asarray(bf.delay_and_sum_weights(M, FS, delays))
    Y = np.einsum("fc,tfc->tf", wqH, X)
    expected = np.asarray(hermitian_mirror(jnp.asarray(Y), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=1e-5)


def test_subband_mvdr_diffuse_matches_batch():
    frames_full, X = _subband_frames(10)
    delays = _delays()
    rng = np.random.default_rng(11)
    mpos = rng.uniform(-0.1, 0.1, (C, 3))

    mv = cb.SubbandMVDRPtr(fftLen=M)
    for ch in range(C):
        mv.set_channel(_SrcStream(frames_full[ch]))
    mv.calc_array_manifold_vectors(FS, delays)
    assert mv.set_diffuse_noise_model(mpos, FS)
    mv.set_all_diagonal_loading(0.01)
    assert mv.calc_mvdr_weights(FS)
    out = np.stack([np.asarray(v) for v in mv], axis=0)

    wqH = np.asarray(bf.superdirective_weights(mpos, delays, M, FS, mu=0.01))
    Y = np.einsum("fc,tfc->tf", wqH, X)
    expected = np.asarray(hermitian_mirror(jnp.asarray(Y), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=1e-4)

    # accessors: C++-convention weights are the conjugates of the applied ones
    np.testing.assert_allclose(mv.mvdr_weights(3), np.conj(wqH[3]), atol=1e-5)


def test_subband_mvdr_explicit_rnn_and_divide():
    rng = np.random.default_rng(12)
    delays = _delays()
    mv = cb.SubbandMVDR(fftLen=M)
    for ch in range(C):
        mv.set_channel(_SrcStream(np.zeros((2, M), np.complex64)))
    mv.calc_array_manifold_vectors(FS, delays)
    A = rng.standard_normal((C, C)) + 1j * rng.standard_normal((C, C))
    Rnn = (A @ A.conj().T + C * np.eye(C)).astype(np.complex64)
    for f in range(F):
        assert mv.set_noise_spatial_spectral_matrix(f, Rnn)
    mv.divide_all_nondiagonal_elements(0.5)

    Rdiv = Rnn.copy()
    off = ~np.eye(C, dtype=bool)
    Rdiv[off] /= 1.5
    np.testing.assert_allclose(mv.noise_spatial_spectral_matrix(2), Rdiv, atol=1e-5)

    assert mv.calc_mvdr_weights(FS)
    wqH = np.asarray(
        bf.mvdr_weights(
            jnp.broadcast_to(jnp.asarray(Rdiv), (F, C, C)),
            jnp.asarray(bf.array_manifold(M, FS, delays)),
        )
    )
    np.testing.assert_allclose(mv.mvdr_weights(4), np.conj(wqH[4]), atol=1e-5)
    # bin 0 is all-ones per the reference (beamformer.cc:2366-2370)
    np.testing.assert_allclose(mv.mvdr_weights(0), np.ones(C), atol=0)


def test_subband_mvdr_gsc_blocking_and_output():
    frames_full, X = _subband_frames(13)
    delays = _delays()
    rng = np.random.default_rng(14)
    mpos = rng.uniform(-0.1, 0.1, (C, 3))

    mvg = cb.SubbandMVDRGSCPtr(fftLen=M)
    for ch in range(C):
        mvg.set_channel(_SrcStream(frames_full[ch]))
    mvg.calc_array_manifold_vectors(FS, delays)
    mvg.set_diffuse_noise_model(mpos, FS)
    mvg.set_all_diagonal_loading(0.01)
    mvg.calc_mvdr_weights(FS)
    assert mvg.calc_blocking_matrix2()

    # orthogonal condition: wmvdr^T B = 0 for bins >= 1
    wmvdr = np.stack([mvg.mvdr_weights(f) for f in range(F)])
    for f in range(1, F):
        Bf = mvg.blocking_matrix(0, f)
        np.testing.assert_allclose(wmvdr[f] @ Bf, 0, atol=1e-5)

    out = np.stack([np.asarray(v) for v in mvg], axis=0)
    Y = np.einsum("fc,tfc->tf", np.conj(wmvdr), X)  # wa = 0
    expected = np.asarray(hermitian_mirror(jnp.asarray(Y), M))
    np.testing.assert_allclose(out, expected, rtol=0, atol=1e-4)

    # blocking-matrix branch output b_0^H X of the last frame
    bm_out = mvg.blocking_matrix_output(0)
    B0 = np.stack([mvg.blocking_matrix(0, f)[:, 0] for f in range(F)])
    Yb = np.einsum("fc,fc->f", np.conj(B0), X[-1])
    np.testing.assert_allclose(
        bm_out, np.asarray(hermitian_mirror(jnp.asarray(Yb), M)), atol=1e-4
    )


def test_subband_orthogonalizer_routes_branches():
    frames_full, _ = _subband_frames(15)
    delays = _delays()
    rng = np.random.default_rng(16)
    mpos = rng.uniform(-0.1, 0.1, (C, 3))

    def build():
        mvg = cb.SubbandMVDRGSC(fftLen=M)
        for ch in range(C):
            mvg.set_channel(_SrcStream(frames_full[ch]))
        mvg.calc_array_manifold_vectors(FS, delays)
        mvg.set_diffuse_noise_model(mpos, FS)
        mvg.calc_mvdr_weights(FS)
        mvg.calc_blocking_matrix2()
        return mvg

    direct = build()
    expected_main = np.asarray(direct.next(0))
    expected_bm = np.asarray(direct.blocking_matrix_output(1))

    ortho0 = cb.SubbandOrthogonalizerPtr(build(), outChanX=0)
    np.testing.assert_allclose(np.asarray(ortho0.next(0)), expected_main, atol=1e-6)

    ortho2 = cb.SubbandOrthogonalizer(build(), outChanX=2)
    np.testing.assert_allclose(np.asarray(ortho2.next(0)), expected_bm, atol=1e-6)


def test_snapshot_array_roundtrip():
    rng = np.random.default_rng(17)
    sa = cb.SnapShotArrayPtr(M, C)
    samp = rng.standard_normal((C, M)) + 1j * rng.standard_normal((C, M))
    for c in range(C):
        sa.set_samples(samp[c], c)
    sa.update()
    for f in (0, 3, M - 1):
        np.testing.assert_allclose(sa.snapshot(f), samp[:, f], atol=1e-6)
    sa.zero()
    np.testing.assert_allclose(sa.snapshot(3), 0.0)


def test_gsc_write_fir_coeff(tmp_path):
    delays = _delays()
    gsc = cb.SubbandGSC(fftLen=M)
    for ch in range(C):
        gsc.set_channel(_SrcStream(np.zeros((1, M), np.complex64)))
    gsc.calc_gsc_weights(FS, delays)
    fn = tmp_path / "fir.txt"
    assert gsc.write_fir_coeff(str(fn), winType=1)
    lines = fn.read_text().strip().split("\n")
    assert lines[0].split() == [str(C), str(M)]
    fir = np.array([[float(v) for v in line.split()] for line in lines[1:]])
    expected = np.asarray(
        bf.weights_to_fir(jnp.asarray(np.conj(np.asarray(bf.array_manifold(M, FS, delays)))), 1)
    )
    np.testing.assert_allclose(fir, expected, rtol=0, atol=1e-6)
