"""SAD/VAD tests: golden transliterations + functional detection checks."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import sad


def test_simple_energy_vad_golden(rng):
    T, M = 50, 16
    X = (rng.standard_normal((T, M)) + 1j * rng.standard_normal((T, M))).astype(np.complex64)
    X[20:30] *= 8.0
    dec = np.asarray(sad.simple_energy_vad(X, threshold=2.0, gamma=0.995))
    # golden loop (sad.cc:155-175)
    se = 0.0
    golden = []
    for t in range(T):
        e = float(np.sum(np.abs(X[t]) ** 2))
        se = 0.995 * se + 0.005 * e
        golden.append(e / se > 2.0)
    assert dec.tolist() == golden
    assert dec[21:29].all()  # loud region detected


def test_likelihood_ratio_vad_golden(rng):
    from scipy.special import hyp1f1

    T, M = 30, 8
    lam = np.full(M, 1.0)
    X = (rng.standard_normal((T, M)) + 1j * rng.standard_normal((T, M))).astype(np.complex64)
    X[10:20] *= 5.0
    alpha, thr = 0.98, 0.5
    dec = np.asarray(sad.simple_likelihood_ratio_vad(X, lam, thr, alpha))

    prev_Ak = np.sqrt(lam)
    golden = []
    for t in range(T):
        logLR = 0.0
        newAk = prev_Ak.copy()
        for k in range(M):
            Rk = abs(X[t, k])
            gammak = Rk * Rk / lam[k]
            xik = alpha * (prev_Ak[k] ** 2 / lam[k]) + (1 - alpha) * max(gammak - 1.0, 0.0)
            vk = (xik / (1 + xik)) * gammak
            Ak = (np.sqrt(np.pi) / 2) * (np.sqrt(vk) / gammak) * hyp1f1(-0.5, 1.0, -vk) * Rk
            newAk[k] = Ak
            logLR += -np.log(1 + xik) + gammak * xik / (1 + xik)
        prev_Ak = newAk
        golden.append(logLR / M > thr)
    assert dec.tolist() == golden
    assert dec[11:19].all()


def test_hangover_machine():
    above = np.array([0, 1, 1, 0, 1, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0], bool)
    out = np.asarray(sad.energy_hangover_machine(above, head_n=3, tail_n=3))
    np.testing.assert_array_equal(out, above.astype(float))


def test_power_metric_and_features(rng):
    C, T, F = 3, 20, 17
    spectra = np.abs(rng.standard_normal((C, T, F))).astype(np.float32)
    m = np.asarray(sad.power_spectrum_metric(spectra, 32, 1, 15))
    assert set(np.unique(m)).issubset({-1.0, 1.0})

    spec = np.abs(rng.standard_normal((T, F))).astype(np.float32) + 0.1
    for fn in [
        lambda s: sad.brightness(s, 16000.0),
        sad.energy_diffusion,
        lambda s: sad.band_energy_ratio(s, 16000.0),
        sad.normalized_flux,
        sad.negative_entropy,
        sad.significant_subbands,
        lambda s: sad.normalized_bandwidth(s, 16000.0),
    ]:
        out = np.asarray(fn(spec))
        assert out.shape == (T,)
        assert np.isfinite(out).all()


def test_pca_recovers_dominant_direction(rng):
    N = 500
    d = np.array([3.0, 1.0, 0.2])
    X = rng.standard_normal((N, 3)) * d
    comps, w, mean = sad.pca(np.asarray(X, np.float32))
    comps = np.asarray(comps)
    assert abs(comps[0, 0]) > 0.95  # first principal axis ~ e_0
    assert np.all(np.diff(np.asarray(w)) <= 1e-5)


def test_fast_ica_separates_sources(rng):
    N = 2000
    s1 = np.sign(rng.standard_normal(N))  # super-gaussian-ish
    s2 = rng.uniform(-1, 1, N) * np.sqrt(3)
    S = np.c_[s1, s2]
    A = np.array([[1.0, 0.6], [0.4, 1.0]])
    X = (S @ A.T).astype(np.float32)
    W, comps, eig, mean = sad.fast_ica(X, 2, iterations=100)
    Xw = (X - np.asarray(mean)) @ np.asarray(comps) / np.sqrt(np.asarray(eig) + 1e-12)
    rec = Xw @ np.asarray(W).T
    # each recovered component should correlate strongly with one source
    corr = np.abs(np.corrcoef(rec.T, S.T)[:2, 2:])
    assert corr.max(axis=1).min() > 0.9, corr


def test_mlp_vad_runs(rng):
    D, H = 13, 8
    mlp = sad.MLPVad(
        W1=rng.standard_normal((9 * D, H)).astype(np.float32) * 0.1,
        b1=np.zeros(H, np.float32),
        W2=rng.standard_normal((H, 2)).astype(np.float32),
        b2=np.zeros(2, np.float32),
    )
    cep = rng.standard_normal((30, D)).astype(np.float32)
    dec = np.asarray(mlp(cep))
    assert dec.shape == (30,) and dec.dtype == bool


def test_negentropy_and_mi_metrics(rng):
    T, F = 40, 17
    fftlen = 32
    X1 = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)
    X2 = (X1 + 0.3 * (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F)))).astype(np.complex64)
    env = np.abs(X1) ** 2 + 0.5
    dec, metric = sad.negentropy_metric(X1, env, fftlen, shape_f=0.5)
    assert np.asarray(metric).shape == (T,)
    assert np.isfinite(np.asarray(metric)).all()
    dec2, mi = sad.mutual_information_metric(X1, X2, env, env, fftlen)
    assert np.isfinite(np.asarray(mi)).all()
    # correlated channels should eventually yield positive MI
    assert np.asarray(mi)[10:].mean() > 0


def test_ccc_and_lowfull_metrics(rng):
    T, F, C = 20, 17, 3
    fftlen = 32
    base = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F))).astype(np.complex64)
    spectra = np.stack([base, base, base * 0.5])  # correlated channels
    dec, metric = sad.ccc_metric(spectra, fftlen)
    assert np.asarray(metric).shape == (T,)
    assert np.asarray(metric).mean() > 0.1  # identical channels correlate

    frames = rng.standard_normal((T, 64)).astype(np.float32)
    ratio = np.asarray(sad.low_full_band_energy_ratio_metric(frames))
    assert ratio.shape == (T,)
    assert np.isfinite(ratio).all()


def test_mlp_vad_spnsp_file_loader(tmp_path, rng):
    """Round-trip the reference's text weight format and match a float
    transliteration of Mlp_Post/Mlp_Ffwd (neural_spnsp_det.c:51-129)."""
    from distant_speech_recognition_tpu.models.sad import MLPVad

    featdim, context, H, O = 5, 2, 7, 2
    nin = featdim * (2 * context + 1)
    w1 = rng.standard_normal((H, nin)).astype(np.float32)  # u2-major like the file
    w2 = rng.standard_normal((O, H)).astype(np.float32)
    b1 = rng.standard_normal(H).astype(np.float32)
    b2 = rng.standard_normal(O).astype(np.float32)
    mean = rng.standard_normal(featdim).astype(np.float32)
    var = (0.5 + rng.random(featdim)).astype(np.float32)

    path = tmp_path / "spnsp.wgt"
    with open(path, "w") as f:
        f.write(f"weights12 {w1.size}\n" + " ".join(str(float(v)) for v in w1.ravel()) + "\n")
        f.write(f"weights23 {w2.size}\n" + " ".join(str(float(v)) for v in w2.ravel()) + "\n")
        f.write(f"bias2 {b1.size}\n" + " ".join(str(float(v)) for v in b1) + "\n")
        f.write(f"bias3 {b2.size}\n" + " ".join(str(float(v)) for v in b2) + "\n")
        f.write(f"mean {featdim}\n" + " ".join(str(float(v)) for v in mean) + "\n")
        f.write(f"var {featdim}\n" + " ".join(str(float(v)) for v in var) + "\n")

    vad = MLPVad.from_spnsp_file(str(path), featdim, context, H, O, threshold=0.5)

    T = 9
    cep = rng.standard_normal((T, featdim)).astype(np.float32)

    # transliteration: stacked context (edge replication), (f-mean)/var,
    # sigmoid hidden, softmax output, speech = out[0] >= threshold
    want = []
    tiled_mean = np.tile(mean, 2 * context + 1)
    tiled_var = np.tile(var, 2 * context + 1)
    for t in range(T):
        idx = np.clip(np.arange(t - context, t + context + 1), 0, T - 1)
        x = cep[idx].reshape(-1)
        x = (x - tiled_mean) / tiled_var
        h = 1.0 / (1.0 + np.exp(-(w1 @ x + b1)))
        o = w2 @ h + b2
        e = np.exp(o - o.max())
        p = e / e.sum()
        want.append(p[0] >= 0.5)
    import jax.numpy as jnp
    got = np.asarray(vad(jnp.asarray(cep)))
    assert list(got) == want
