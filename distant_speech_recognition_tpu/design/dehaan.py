"""de Haan least-squares filterbank prototype design.

Port of the reference's AnalysisOversampledDFTDesign /
SynthesisOversampledDFTDesign (modulated/prototype_design.cc:192-940; de Haan
et al., IEEE TSAP 2003): the analysis prototype minimizes passband response
error + inband aliasing (solve (A + C) h = b), and the synthesis prototype
minimizes total response error + v * residual aliasing (solve (E + v P) g = f),
both via SVD with relative singular-value thresholding.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "design_dehaan_analysis",
    "design_dehaan_synthesis",
    "design_dehaan_pair",
]


def _sinc_ratio(x):
    out = np.ones_like(x, dtype=np.float64)
    nz = x != 0
    out[nz] = np.sin(x[nz]) / x[nz]
    return out


def _aliasing_C(L: int, D: int) -> np.ndarray:
    i = np.arange(L)
    lag = i[None, :] - i[:, None]
    factor = np.where(lag % D == 0, float(D - 1), -1.0)
    C = np.where(
        lag == 0,
        factor / D,
        factor * np.divide(np.sin(np.pi * lag / D), np.pi * np.where(lag == 0, 1, lag)),
    )
    return C


def _svd_solve(Amat: np.ndarray, b: np.ndarray, tolerance: float) -> np.ndarray:
    """SVD solve with the reference's absolute-relative threshold
    (_solve, prototype_design.cc:651-676)."""
    U, s, Vt = np.linalg.svd(Amat)
    L = Amat.shape[0]
    thr = L * s[0] * tolerance
    inv_s = np.where(s > thr, 1.0 / np.where(s > thr, s, 1.0), 0.0)
    return Vt.T @ (inv_s * (U.T @ b))


def design_dehaan_analysis(M: int, m: int, r: int, wp_factor: float = 1.0,
                           tau: int = -1, tolerance: float = 2.2204e-16):
    """Returns (h [L], (eps_p_dB, eps_i_dB)) for L = M*m."""
    L = M * m
    D = max(M >> r, 1)
    wp = np.pi / (wp_factor * M)
    tau_h = L // 2 if tau < 0 else tau

    i = np.arange(L)
    A = _sinc_ratio(wp * (i[None, :] - i[:, None]))
    b = _sinc_ratio(wp * (tau_h - i))
    C = _aliasing_C(L, D)

    h = _svd_solve(A + C, b, tolerance)
    eps_p = 10 * np.log10(h @ A @ h - 2 * h @ b + 1.0)
    eps_i = 10 * np.log10(h @ C @ h)
    return h, (eps_p, eps_i)


def design_dehaan_synthesis(h: np.ndarray, M: int, m: int, r: int, v: float = 100.0,
                            wp_factor: float = 1.0, tau: int = -1,
                            tolerance: float = 2.2204e-16):
    """Returns (g [L], (eps_t_dB, eps_r_dB)) given the analysis prototype
    (_calculateEfP + _solve, prototype_design.cc:820-892)."""
    h = np.asarray(h, np.float64).ravel()
    L = M * m
    D = max(M >> r, 1)
    tau_h = L // 2 if tau < 0 else tau
    tau_t = 2 * tau_h
    R = M // D

    idx = np.arange(L)
    # E[m, n] = sum_k h[kM - m] h[kM - n]
    E = np.zeros((L, L))
    for k in range(2 * m + 1):
        kM = k * M
        src = kM - idx
        valid = (src >= 0) & (src < L)
        hv = np.where(valid, h[np.clip(src, 0, L - 1)], 0.0)
        E += np.outer(hv, hv)
    # P[m, n] = factor(m - n) * autocorr_h(m - n)
    acorr = np.correlate(h, h, mode="full")

    def acorr_at(lags):
        out = np.zeros(lags.shape)
        valid = np.abs(lags) <= L - 1
        out[valid] = acorr[lags[valid] + L - 1]
        return out

    lag = idx[:, None] - idx[None, :]
    factor = np.where(lag % D == 0, float(D - 1), -1.0)
    P = factor * acorr_at(lag)
    # f[m] = h[tau_t - m]
    src = tau_t - idx
    valid = (src >= 0) & (src < L)
    f = np.where(valid, h[np.clip(src, 0, L - 1)], 0.0)

    E *= float(R * R)
    f *= float(R)
    P *= float(M) / (D * D)

    g = _svd_solve(E + v * P, f, tolerance)
    eps_t = 10 * np.log10(max(g @ E @ g - 2 * g @ f + 1.0, 1e-300))
    eps_r = 10 * np.log10(max(g @ P @ g, 1e-300))
    return g, (eps_t, eps_r)


def design_dehaan_pair(M: int, m: int, r: int, v: float = 100.0, wp_factor: float = 1.0):
    h, _ = design_dehaan_analysis(M, m, r, wp_factor)
    g, _ = design_dehaan_synthesis(h, M, m, r, v, wp_factor)
    return h, g
