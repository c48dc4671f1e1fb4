"""Binaural ITD/IID binary masking (C. Kim, Interspeech 2010).

Batched reformulation of postfilter/binauralprocessing.cc: per-bin interaural
time differences, smoothed binary masks (scan over frames carrying the
previous mask), and the threshold estimators that grid-search a decorrelation
(ITD) or kurtosis (IID) cost over the whole utterance at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "calc_itd",
    "kim_binary_mask",
    "iid_binary_mask",
    "kim_itd_threshold",
    "iid_threshold",
    "fd_iid_threshold",
]


def calc_itd(XL: jax.Array, XR: jax.Array) -> jax.Array:
    """Per-bin interaural time difference in samples
    (calcITDf, binauralprocessing.cc:17-37): wrapped phase difference over
    bin frequency.  Inputs [..., T, F] half band; bin 0 is unused (returns 0).

    [sic] the ITD is UNSIGNED: the reference takes fabs of every wrap
    candidate (binauralprocessing.cc:22-34), so left/right sign is lost
    there too and the Kim masks compare magnitudes only.
    """
    F = XL.shape[-1]
    fftlen = 2 * (F - 1)
    d = jnp.angle(XL) - jnp.angle(XR)
    wrapped = jnp.minimum(jnp.minimum(jnp.abs(d), jnp.abs(d - 2 * jnp.pi)), jnp.abs(d + 2 * jnp.pi))
    k = jnp.arange(F)
    denom = 2.0 * jnp.pi * jnp.where(k > 0, k, 1) / fftlen
    return jnp.where(k > 0, wrapped / denom, 0.0)


def _smoothed_mask_scan(keep: jax.Array, alpha: float, d_eta: float) -> jax.Array:
    """mu_t = alpha mu_{t-1} + (1-alpha) * (1 if keep else d_eta)
    (masking1, binauralprocessing.cc:138-178; prevMu starts at 1.0 —
    gsl_vector_float_set_all(prevMu_, 1.0) in the BinaryMaskFilter ctor)."""
    target = jnp.where(keep, 1.0, d_eta)

    def step(mu, tgt):
        mu = alpha * mu + (1.0 - alpha) * tgt
        return mu, mu

    mu0 = jnp.ones(keep.shape[-1], jnp.float32)
    _, mus = jax.lax.scan(step, mu0, target)
    return mus


@partial(jax.jit, static_argnums=(2,))
def kim_binary_mask(
    XL: jax.Array,
    XR: jax.Array,
    chan: int = 0,
    threshold: float = 0.0,
    alpha: float = 0.0,
    d_eta: float = 0.01,
) -> jax.Array:
    """ITD-gated smoothed binary mask (KimBinaryMaskFilter::masking1,
    binauralprocessing.cc:138-180).

    Keeps the chosen channel's bin when the ITD is on its side of the
    threshold, attenuating to ``d_eta`` otherwise; bin 0 passes the left
    channel unmasked.  Inputs [T, F]; returns masked [T, F].
    """
    itd = calc_itd(XL, XR)
    if chan == 0:
        keep = itd <= threshold
        X = XL
    else:
        keep = itd > threshold
        X = XR
    mu = _smoothed_mask_scan(keep, alpha, d_eta)
    out = X * mu.astype(X.dtype)
    return out.at[..., 0].set(XL[..., 0])


@partial(jax.jit, static_argnums=(2,))
def iid_binary_mask(
    XL: jax.Array,
    XR: jax.Array,
    chan: int = 0,
    threshold: float = 0.0,
    alpha: float = 0.0,
    d_eta: float = 0.01,
    thresholds_per_freq=None,
) -> jax.Array:
    """Magnitude-difference mask (IIDBinaryMaskFilter::masking1): keep the
    target channel's bin when its magnitude exceeds the other channel's
    plus the threshold."""
    XT, XI = (XL, XR) if chan == 0 else (XR, XL)
    th = threshold if thresholds_per_freq is None else jnp.asarray(thresholds_per_freq)
    keep = jnp.abs(XT) > (jnp.abs(XI) + th)
    mu = _smoothed_mask_scan(keep, alpha, d_eta)
    out = XT * mu.astype(XT.dtype)
    return out.at[..., 0].set(XL[..., 0])


def kim_itd_threshold(
    XL: jax.Array,
    XR: jax.Array,
    min_threshold: float | None = None,
    max_threshold: float | None = None,
    width: float = 0.02,
    min_bin: int = 1,
    max_bin: int | None = None,
    d_eta: float = 0.01,
    power_coeff: float = 1.0 / 15.0,
):
    """Estimate the ITD masking threshold by minimizing the correlation
    between the masked target/interference power envelopes
    (KimITDThresholdEstimator, binauralprocessing.cc:314-430).

    Returns (threshold, candidate_grid, cost_values).
    """
    if min_threshold is None or max_threshold is None:
        min_threshold = -0.2 * 16000 / 340
        max_threshold = 0.2 * 16000 / 340
    cands = np.arange(min_threshold, max_threshold + 1e-9, width)
    F = XL.shape[-1]
    hi = F if max_bin is None else max_bin
    band = slice(min_bin, hi)

    itd = np.asarray(calc_itd(XL, XR))[..., band]  # [T, Fb]
    PL = np.abs(np.asarray(XL))[..., band] ** 2
    PR = np.abs(np.asarray(XR))[..., band] ** 2

    keep = itd[None] <= cands[:, None, None]  # [G, T, Fb]
    P_T = np.sum(np.where(keep, PL[None], (d_eta**2) * PL[None]), axis=-1)  # [G, T]
    P_I = np.sum(np.where(keep, (d_eta**2) * PR[None], PR[None]), axis=-1)
    R_T = P_T**power_coeff
    R_I = P_I**power_coeff

    mean_T = R_T.mean(axis=1)
    mean_I = R_I.mean(axis=1)
    sig_T = (R_T**2).mean(axis=1) - mean_T**2
    sig_I = (R_I**2).mean(axis=1) - mean_I**2
    cross = (R_T * R_I).mean(axis=1)
    rho = np.abs((cross - mean_T * mean_I) / np.sqrt(np.maximum(sig_T * sig_I, 1e-30)))
    best = int(np.argmin(rho))
    return float(cands[best]), cands, rho


def iid_threshold(
    XL: jax.Array,
    XR: jax.Array,
    min_threshold: float,
    max_threshold: float,
    width: float,
    min_bin: int = 1,
    max_bin: int | None = None,
    d_eta: float = 0.01,
    power_coeff: float = 0.5,
    beta: float = 3.0,
):
    """IID threshold by maximizing the joint kurtosis of the masked
    envelopes (IIDThresholdEstimator, binauralprocessing.cc:577-661).
    Returns (threshold, candidate_grid, cost_values)."""
    cands = np.arange(min_threshold, max_threshold + 1e-9, width)
    F = XL.shape[-1]
    hi = F if max_bin is None else max_bin
    band = slice(min_bin, hi)
    AL = np.abs(np.asarray(XL))[..., band]
    AR = np.abs(np.asarray(XR))[..., band]

    th = cands[:, None, None]
    mu_T = np.where(AL <= AR + th, d_eta, 1.0)
    mu_I = np.where(AR <= AL + th, d_eta, 1.0)
    Y1_T = (AL[None] * mu_T) ** (2.0 * power_coeff)
    Y1_I = (AR[None] * mu_I) ** (2.0 * power_coeff)
    Y2_T = Y1_T**2
    Y2_I = Y1_I**2
    s_Y1_T = Y1_T.sum(-1)
    s_Y1_I = Y1_I.sum(-1)
    s_Y2_T = Y2_T.sum(-1)
    s_Y2_I = Y2_I.sum(-1)
    s_Y4_T = (Y2_T**2).sum(-1)
    s_Y4_I = (Y2_I**2).sum(-1)

    sigma = s_Y2_T.mean(1) + s_Y2_I.mean(1)
    kurt = (s_Y4_T.mean(1) + s_Y4_I.mean(1)) - beta * sigma * sigma
    best = int(np.argmax(kurt))
    return float(cands[best]), cands, -kurt


def fd_iid_threshold(
    XL: jax.Array,
    XR: jax.Array,
    min_threshold: float,
    max_threshold: float,
    width: float,
    d_eta: float = 0.01,
    power_coeff: float = 1.0 / 15.0,
    beta: float = 3.0,
):
    """Frequency-dependent IID threshold estimation
    (FDIIDThresholdEstimator, binauralprocessing.cc:700-920): per frequency
    bin, pick the masking threshold maximizing the kurtosis cost
    ``J(f, th) = E[Y^4] - beta E[Y^2]^2`` of the masked left/right
    envelopes raised to ``2 * power_coeff``.

    ``XL/XR``: [T, F] half-band subband snapshots (bin 0 is ignored, as the
    reference accumulates bins 1..M/2 only; its entry of the output vector
    stays at the first candidate).  Returns
    (threshold_per_freq [F], candidate_grid [K], cost [F, K]).
    """
    cands = np.arange(min_threshold, max_threshold + 1e-9, width)
    AL = np.abs(np.asarray(XL))  # [T, F]
    AR = np.abs(np.asarray(XR))

    th = cands[:, None, None]  # [K, 1, 1]
    mu_T = np.where(AL[None] <= AR[None] + th, d_eta, 1.0)
    mu_I = np.where(AR[None] <= AL[None] + th, d_eta, 1.0)
    Y1_T = (AL[None] * mu_T) ** (2.0 * power_coeff)
    Y1_I = (AR[None] * mu_I) ** (2.0 * power_coeff)
    Y2_T = Y1_T**2
    Y2_I = Y1_I**2
    # per-bin time averages (accumStats1 + calc_threshold normalization)
    Y4 = (Y2_T**2 + Y2_I**2).mean(axis=1)  # [K, F]
    sig = (Y2_T + Y2_I).mean(axis=1)
    cost = (Y4 - beta * sig * sig).T  # [F, K]
    # rho = -cost minimized with <=, so later candidates win ties
    best = cost.shape[1] - 1 - np.argmax(cost[:, ::-1], axis=1)
    thr = cands[best]
    thr[0] = cands[0]  # bin 0 never updated by the reference
    return thr, cands, cost
