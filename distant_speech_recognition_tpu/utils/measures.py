"""Objective quality measures (objective_measure/objective_measure.h:36-75):
SNR, segmental SNR, and the Itakura-Saito distance on power spectra."""

from __future__ import annotations

import numpy as np

__all__ = [
    "snr",
    "segmental_snr",
    "itakura_saito",
    "itakura_saito_frames",
    "MEAN_NORMALIZATION",
    "MAXPEAK_SCALING",
    "STDV_SCALING",
    "CC_SCALING",
]

# Bit flags of calcSNR's normalizationOption (objective_measure.cc:24-27).
MEAN_NORMALIZATION = 0x01
MAXPEAK_SCALING = 0x02
STDV_SCALING = 0x04
CC_SCALING = 0x08


def snr(original, enhanced, normalize: bool = True,
        normalization_option: int | None = None) -> float:
    """Global SNR in dB between a reference and a processed signal
    (SNR::getSNR2 -> calcSNR, objective_measure.cc:42-160).

    ``normalization_option`` takes the reference's bit flags (MEAN |
    MAXPEAK | STDV | CC); when omitted, ``normalize=True`` maps to
    CC_SCALING (least-squares gain on the processed signal, the reference's
    cross-correlation scaling) and ``normalize=False`` to no normalization.
    """
    x = np.asarray(original, np.float64)
    y = np.asarray(enhanced, np.float64)
    if normalization_option is None:
        normalization_option = CC_SCALING if normalize else 0
    opt = normalization_option

    if opt & MEAN_NORMALIZATION:
        x = x - x.mean()
        y = y - y.mean()
    s1 = s2 = 1.0
    if opt & MAXPEAK_SCALING:
        s1, s2 = 1.0 / x.max(), 1.0 / y.max()
    elif opt & STDV_SCALING:
        s2 = np.sqrt(np.mean(x**2) / np.mean(y**2))
    elif opt & CC_SCALING:
        nc = min(len(x), len(y))
        denom = np.dot(y[:nc], y[:nc])
        if denom > 0:
            s2 = np.dot(x[:nc], y[:nc]) / denom

    n = min(len(x), len(y))
    xv, yv = x[:n] * s1, y[:n] * s2
    err = xv - yv
    return float(10.0 * np.log10(np.dot(xv, xv) / max(np.dot(err, err), 1e-20)))


def segmental_snr(original, enhanced, frame_len: int = 256,
                  min_db: float = -10.0, max_db: float = 35.0) -> float:
    """Frame-averaged SNR with the usual clamping (segmentalSNR)."""
    x = np.asarray(original, np.float64)
    y = np.asarray(enhanced, np.float64)
    n = min(len(x), len(y)) // frame_len
    vals = []
    for i in range(n):
        seg = slice(i * frame_len, (i + 1) * frame_len)
        err = x[seg] - y[seg]
        p = np.dot(x[seg], x[seg])
        e = np.dot(err, err)
        if p <= 0:
            continue
        vals.append(np.clip(10.0 * np.log10(p / max(e, 1e-20)), min_db, max_db))
    return float(np.mean(vals)) if vals else 0.0


def itakura_saito(ps_ref, ps_test, eps: float = 1e-12) -> float:
    """Itakura-Saito distance between power spectra, averaged over frames
    (ItakuraSaitoMeasurePS::getDistance).  Inputs [T, F] (or [F])."""
    p = np.maximum(np.asarray(ps_ref, np.float64), eps)
    q = np.maximum(np.asarray(ps_test, np.float64), eps)
    r = p / q
    return float(np.mean(r - np.log(r) - 1.0))


def itakura_saito_frames(spec_ref, spec_test, bframe: int = 0,
                         eframe: int = -1) -> float:
    """The reference's discrete IS distance over STFT frames
    (calcISDistance, objective_measure.cc:284-331): bins ``1..M/2`` only,
    bins where either power is zero are skipped, per-frame sum divided by
    ``M/2``, averaged over frames ``bframe..eframe``.

    ``spec_ref``/``spec_test``: complex STFT frames ``[T, M]``
    (`ops.stft_analysis` output, the NormalFFTAnalysisBank equivalent).
    """
    s1 = np.asarray(spec_ref)
    s2 = np.asarray(spec_test)
    T = min(s1.shape[0], s2.shape[0])
    M = s1.shape[-1]
    if eframe < 0 or eframe >= T:
        eframe = T - 1
    p1 = np.abs(s1[bframe : eframe + 1, 1 : M // 2 + 1]) ** 2
    p2 = np.abs(s2[bframe : eframe + 1, 1 : M // 2 + 1]) ** 2
    valid = (p1 > 0.0) & (p2 > 0.0)
    ratio = np.where(valid, p1 / np.where(valid, p2, 1.0), 1.0)
    eis = np.where(valid, ratio - np.log(ratio) - 1.0, 0.0)
    per_frame = eis.sum(axis=-1) / (M // 2)
    return float(per_frame.mean()) if per_frame.size else 0.0
