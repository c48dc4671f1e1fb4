"""GGD/CGGD densities + parameter fits vs float64 transliterations of
lib/pyggd.py (GGaussianD/MME4GGaussianD/MLE4GGaussianD) and lib/pycggd.py
(CGGaussianD/MLE4CGGaussianD)."""

import numpy as np
import pytest
from scipy.special import gamma as sp_gamma
from scipy.special import psi as sp_psi

from distant_speech_recognition_tpu.models import ggd


def _ref_ggd_logprob(x, p, sigma, mean=0.0):
    # GGaussianD.fixConst + prob (pyggd.py:43-103), float64
    A = sigma * np.sqrt(sp_gamma(1.0 / p) / sp_gamma(3.0 / p))
    lNF = -(np.log(2 * sp_gamma(1 + 1.0 / p)) + np.log(A))
    return lNF - np.power(np.abs((x - mean) / A), p)


def _ref_cggd_logprob(x, p, sa, mean=0.0):
    # CGGaussianD.fixConst + prob (pycggd.py:46-106)
    B = sp_gamma(1.0 / p) / sp_gamma(2.0 / p)
    llconst = np.log(p) - (np.log(np.pi) + np.log(sp_gamma(1.0 / p)) + np.log(B))
    x2 = np.abs(x - mean) ** 2
    return llconst - np.log(sa) - np.power(x2 / (sa * B), p)


def test_ggd_log_prob_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256) * 3.0
    for p, sigma in [(0.7, 1.0), (1.0, 2.5), (2.0, 0.5)]:
        got = np.asarray(ggd.ggd_log_prob(x, p, sigma))
        want = _ref_ggd_logprob(x, p, sigma)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ggd_gaussian_special_case():
    # p=2 is N(0, sigma^2): entropy = 0.5 log(2 pi e sigma^2)
    sigma = 1.7
    h = float(ggd.ggd_entropy(2.0, sigma))
    assert abs(h - 0.5 * np.log(2 * np.pi * np.e * sigma**2)) < 1e-5
    x = np.linspace(-3, 3, 7)
    got = np.asarray(ggd.ggd_log_prob(x, 2.0, sigma))
    want = -0.5 * (x / sigma) ** 2 - np.log(sigma * np.sqrt(2 * np.pi))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cggd_gaussian_special_case():
    # p=1 is circular complex N(0, sa): logpdf = -log(pi sa) - |x|^2/sa
    sa = 0.8
    rng = np.random.default_rng(1)
    x = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    got = np.asarray(ggd.cggd_log_prob(x, 1.0, sa))
    want = -np.log(np.pi * sa) - np.abs(x) ** 2 / sa
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    h = float(ggd.cggd_entropy(1.0, sa))
    assert abs(h - np.log(np.pi * np.e * sa)) < 1e-5


def test_cggd_log_prob_matches_reference():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)) * 2.0
    for p, sa in [(0.5, 1.0), (0.7, 3.0), (1.5, 0.25)]:
        got = np.asarray(ggd.cggd_log_prob(x, p, sa))
        want = _ref_cggd_logprob(x, p, sa)
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def _ref_mme_update(x, mean=0.0):
    # MME4GGaussianD acc + update (pyggd.py:199-255)
    n = len(x)
    sigma2 = np.sum((x - mean) ** 2) / n
    val = np.sum(np.abs(x - mean)) / n
    Mp = val * val / sigma2
    if Mp < 0.0131246:
        p = 2 * np.log(27.0 / 16.0) / (np.log(3 / 4) - 2 * np.log(Mp))
    elif Mp < 0.448994:
        a1, a2, a3 = -0.535707356, 1.168939911, -0.1516189217
        p = (-a2 + np.sqrt(a2 * a2 - 4 * a1 * a3 + 4 * a1 * Mp)) / (2 * a1)
    elif Mp < 0.671256:
        b1, b2, b3 = 0.9694429, 0.8727534, 0.07350824
        v = b1 - b2 * Mp
        p = (v - np.sqrt(v * v - 4 * b3 * Mp * Mp)) / (2 * b3 * Mp)
    elif Mp < 3.0 / 4.0:
        c1, c2, c3 = 0.3655157, 0.6723532, 0.033834
        p = (c2 - np.sqrt(c2 * c2 + 4 * c3 * np.log((3 - 4 * Mp) / (4 * c1)))) / (2 * c3)
    else:
        p = np.nan
    return np.sqrt(sigma2), p


@pytest.mark.parametrize("dist", ["laplace", "gaussian", "uniformish"])
def test_fit_ggd_mme_matches_reference(dist):
    rng = np.random.default_rng(3)
    if dist == "laplace":
        x = rng.laplace(size=4096)  # p ~ 1
    elif dist == "gaussian":
        x = rng.standard_normal(4096)  # p ~ 2
    else:
        x = rng.uniform(-1, 1, size=4096) ** 9  # heavy-tailed, small p
    sigma_ref, p_ref = _ref_mme_update(x)
    fit = ggd.fit_ggd_mme(x)
    np.testing.assert_allclose(float(fit.sigma), sigma_ref, rtol=1e-5)
    np.testing.assert_allclose(float(fit.p), p_ref, rtol=2e-4)


def test_fit_ggd_mme_recovers_shape():
    rng = np.random.default_rng(4)
    x = rng.laplace(size=200_000)
    fit = ggd.fit_ggd_mme(x)
    assert abs(float(fit.p) - 1.0) < 0.05
    x = rng.standard_normal(200_000)
    fit = ggd.fit_ggd_mme(x)
    assert abs(float(fit.p) - 2.0) < 0.1


def _ref_ggd_mle(x, p0, sigma0, iterations, alpha=0.05):
    # MLE4GGaussianD acc + update loop (pyggd.py:321-395), float64
    p, sigma = p0, sigma0
    n_itr = 0
    converged = False
    for _ in range(iterations):
        if converged:
            break
        A = sigma * np.sqrt(sp_gamma(1.0 / p) / sp_gamma(3.0 / p))
        acc1S = np.sum(np.abs(x) ** p)
        t = np.power(np.abs(x) / A, p)
        keep = np.abs(x) > 10e-12
        acc1P = np.sum(np.where(keep, t * np.log(np.abs(x) / A + 1e-300), 0.0))
        acc2P = np.sum(t)
        n = len(x)
        new_sigma = np.sqrt(sp_gamma(3.0 / p) / sp_gamma(1.0 / p)) * np.power(
            p * acc1S / n, 1.0 / p
        )
        dLp = (
            sp_psi(1 + 1.0 / p) + 0.5 * sp_psi(1.0 / p) - 1.5 * sp_psi(3.0 / p)
        ) / (p * p) - (
            acc1P + (sp_psi(1.0 / p) - 3 * sp_psi(3.0 / p)) * acc2P / (2 * p)
        ) / n
        new_p = p + dLp * (alpha / (1 + n_itr))
        if abs(new_p - p) < 0.00001:
            converged = True
        sigma = max(new_sigma, 10e-8)
        p = max(new_p, 0.07)
        n_itr += 1
    return sigma, p


def test_fit_ggd_mle_matches_reference():
    rng = np.random.default_rng(5)
    x = rng.laplace(size=2048).astype(np.float32)
    for iters in (1, 2, 5):
        sigma_ref, p_ref = _ref_ggd_mle(x.astype(np.float64), 0.7, 1.3, iters)
        fit = ggd.fit_ggd_mle(x, p0=0.7, sigma0=1.3, iterations=iters)
        np.testing.assert_allclose(float(fit.sigma), sigma_ref, rtol=1e-3)
        np.testing.assert_allclose(float(fit.p), p_ref, rtol=1e-3)


def _ref_cggd_mle(x, p0, sa0, iterations, alpha=0.05):
    # MLE4CGGaussianD acc + update loop (pycggd.py:155-293)
    p, sa = p0, sa0
    n_itr = 0
    converged = False
    n = len(x)
    for _ in range(iterations):
        if converged:
            break
        B = sp_gamma(1.0 / p) / sp_gamma(2.0 / p)
        x2 = np.abs(x) ** 2
        acc1S = np.sum(np.power(x2, p))
        argE = x2 / (B * sa)
        t = np.power(argE, p)
        keep = np.abs(x) > 10e-12
        acc1P = np.sum(np.where(keep, t * np.log(argE + 1e-300), 0.0))
        acc2P = np.sum(t)
        new_sa = (1.0 / B) * np.power(p * acc1S / n, 1.0 / p)
        dLp1 = (n / (p * p)) * (p + 2 * sp_psi(1.0 / p) - 2 * sp_psi(2.0 / p))
        dLp2 = acc1P + acc2P * (sp_psi(1.0 / p) - 2 * sp_psi(2.0 / p)) / p
        new_p = p + (dLp1 - dLp2) * (alpha / (1 + n_itr))
        if abs(new_p - p) < 0.00001:
            converged = True
        sa = max(new_sa, 10e-8)
        p = max(new_p, 0.07)
        n_itr += 1
    return sa, p


def test_fit_cggd_mle_matches_reference():
    rng = np.random.default_rng(6)
    # complex Gaussian -> p should head toward 1
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)) / np.sqrt(2)
    for iters in (1, 3):
        sa_ref, p_ref = _ref_cggd_mle(x, 0.7, 1.0, iters, alpha=0.0005)
        fit = ggd.fit_cggd_mle(x, p0=0.7, sa0=1.0, iterations=iters, alpha=0.0005)
        np.testing.assert_allclose(float(fit.sa), sa_ref, rtol=1e-3)
        np.testing.assert_allclose(float(fit.p), p_ref, rtol=1e-3)


def test_param_file_roundtrip(tmp_path):
    fn = str(tmp_path / "ggd.txt")
    params = ggd.GGDParams(
        sigma=np.float32(1.25), p=np.float32(0.8), mean=np.float32(0.0)
    )
    ggd.write_ggd_param(fn, params)
    back = ggd.read_ggd_param(fn)
    assert abs(float(back.sigma) - 1.25) < 1e-6
    assert abs(float(back.p) - 0.8) < 1e-6
    # file layout: two lines, 3 + 2 fields (pyggd.py:115-119)
    lines = open(fn).read().strip().splitlines()
    assert len(lines) == 2 and len(lines[0].split()) == 3 and len(lines[1].split()) == 2

    fnc = str(tmp_path / "cggd.txt")
    cparams = ggd.CGGDParams(sa=np.float32(2.0), p=np.float32(0.5), mean=0.0)
    ggd.write_ggd_param(fnc, cparams, complex_form=True)
    backc = ggd.read_ggd_param(fnc, complex_form=True)
    assert abs(float(backc.sa) - 2.0) < 1e-6 and abs(float(backc.p) - 0.5) < 1e-6
