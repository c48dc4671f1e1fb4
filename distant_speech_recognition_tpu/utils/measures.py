"""Objective quality measures (objective_measure/objective_measure.h:36-75):
SNR, segmental SNR, and the Itakura-Saito distance on power spectra."""

from __future__ import annotations

import numpy as np

__all__ = ["snr", "segmental_snr", "itakura_saito"]


def snr(original, enhanced, normalize: bool = True) -> float:
    """Global SNR in dB between a reference and a processed signal
    (SNR::getSNR2).  With ``normalize`` the processed signal is scaled to
    the least-squares gain before measuring (removes fixed gain offsets)."""
    x = np.asarray(original, np.float64)
    y = np.asarray(enhanced, np.float64)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    if normalize:
        denom = np.dot(y, y)
        if denom > 0:
            y = y * (np.dot(x, y) / denom)
    err = x - y
    return float(10.0 * np.log10(np.dot(x, x) / max(np.dot(err, err), 1e-20)))


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
