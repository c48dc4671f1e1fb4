"""Frame-by-frame / per-bin numpy mirrors of the reference beamformer math.

Straight float64 transliterations of the algorithm descriptions
(lib/pybeamformer.py, beamformer/beamformer.cc) used as goldens for the
batched JAX implementations.
"""

from __future__ import annotations

import numpy as np


def calc_array_manifold_f(fbinX, fftlen, samplerate, delays):
    delays = np.asarray(delays, np.float64)
    vs = np.exp(-1j * 2.0 * np.pi * fbinX * (samplerate / float(fftlen)) * delays)
    return vs / len(delays)


def calc_blocking_matrix(vs, Nc=1):
    vsize = len(vs)
    bsize = vsize - Nc
    blockMat = np.zeros((vsize, bsize), complex)
    norm_vs = np.inner(vs, np.conjugate(vs))
    if abs(norm_vs) > 0.0:
        PcPerp = np.eye(vsize) - np.outer(np.conjugate(vs), vs) / norm_vs
        for idim in range(bsize):
            vec = PcPerp[:, idim].copy()
            for jdim in range(idim):
                rvec = blockMat[:, jdim]
                ip = np.inner(np.conjugate(rvec), vec)
                vec = vec - rvec * ip
            norm_vec = np.sqrt(abs(np.inner(np.conjugate(vec), vec)))
            blockMat[:, idim] = vec / norm_vec
    return blockMat


def mvdr_weights_ref(R, vs_all):
    """beamformer.cc:2350-2402: per-bin w = invR d / (C d^H invR d), bin0 = ones."""
    F, C = vs_all.shape
    w = np.zeros((F, C), complex)
    w[0] = np.ones(C)
    for f in range(1, F):
        invR = np.linalg.pinv(R[f], rcond=1e-12)
        tmp = np.conjugate(invR).T @ vs_all[f]
        lam = np.vdot(tmp, vs_all[f])  # d^H invR d
        w[f] = tmp / (lam * C)
    return w


def gsc_lms_ref(X, energy, wqH, BmH, cfg):
    """pybeamformer.py:659-762 transliteration.  X: [T,F,C], energy: [T]."""
    T, F, C = X.shape
    B = BmH.shape[1]
    waH = np.zeros((F, B), complex)
    subband_energy = np.full(F, cfg.init_diagonal_load)
    energy_avg = cfg.init_diagonal_load
    gamma = cfg.gamma
    out = np.zeros((T, F), complex)
    for t in range(T):
        if t > 0 and t % cfg.slowdown_after == 0:
            gamma /= 2.0
        gate = energy[t] > energy_avg / cfg.sil_thresh
        for f in range(F):
            XK = X[t, f]
            ZK = BmH[f] @ XK
            YcK = wqH[f] @ XK
            if t > 0:
                se = subband_energy[f] * cfg.beta + (1.0 - cfg.beta) * abs(np.vdot(XK, XK))
            else:
                se = abs(np.vdot(XK, XK))
            se = max(se, cfg.energy_floor)
            if gate:
                epa = YcK - waH[f] @ ZK
                alpha = gamma / se
                watH = waH[f] + epa * np.conjugate(ZK) * alpha
                if cfg.regularization_param > 0:
                    watH = watH - alpha * cfg.regularization_param * waH[f]
                norm = abs(np.dot(watH, np.conjugate(watH)))
                if norm > cfg.max_wa_l2norm:
                    watH = watH * np.sqrt(cfg.max_wa_l2norm / norm)
                waH[f] = watH
                subband_energy[f] = se
            if t >= cfg.min_frames:
                out[t, f] = YcK - waH[f] @ ZK
            else:
                out[t, f] = YcK
        energy_avg = energy_avg * cfg.beta + (1.0 - cfg.beta) * energy[t]
    return out, waH


def gsc_rls_ref(X, energy, wqH, BmH, cfg):
    """pybeamformer.py:816-898 transliteration."""
    T, F, C = X.shape
    B = BmH.shape[1]
    waH = np.zeros((F, B), complex)
    Pz = np.array([np.eye(B) / cfg.init_diagonal_load for _ in range(F)], complex)
    energy_avg = cfg.init_diagonal_load
    out = np.zeros((T, F), complex)
    for t in range(T):
        gate = energy[t] > energy_avg / cfg.sil_thresh
        for f in range(F):
            XK = X[t, f]
            ZK = BmH[f] @ XK
            YcK = wqH[f] @ XK
            if gate:
                PzZ = Pz[f] @ ZK
                ip = np.conjugate(ZK) @ PzZ
                gz = PzZ / (cfg.mu + ip)
                temp = np.conjugate(ZK) @ Pz[f]
                PzK = (Pz[f] - np.outer(gz, temp)) / cfg.mu
                ep = YcK - waH[f] @ ZK
                waHK = waH[f] + cfg.gamma * np.conjugate(gz) * ep
                if cfg.regularization_param > 0:
                    waHK = waHK - np.conjugate(PzK) @ waH[f] * cfg.regularization_param
                waK = np.conjugate(waHK)
                if cfg.constraint_option > 0:
                    waK2 = abs(np.dot(waHK, waK))
                    if cfg.constraint_option in (1, 3) and waK2 > cfg.alpha2:
                        va = PzK @ waK
                        a = abs(np.dot(va, np.conjugate(va)))
                        b = -2.0 * (np.dot(np.conjugate(va), waK)).real
                        c = waK2 - cfg.alpha2
                        arg = b * b - 4.0 * a * c
                        if arg > 0:
                            betaK = -(b + np.sqrt(arg)) / (2.0 * a)
                        else:
                            betaK = -b / (2.0 * a)
                        waHK = waHK - betaK * np.conjugate(va)
                    if cfg.constraint_option >= 2 and waK2 > cfg.max_wa_l2norm:
                        waHK = waHK * np.sqrt(cfg.max_wa_l2norm / waK2)
                        PzK = np.eye(B) / cfg.init_diagonal_load
                Pz[f] = PzK
                waH[f] = waHK
            if t >= cfg.min_frames:
                out[t, f] = YcK - waH[f] @ ZK
            else:
                out[t, f] = YcK
        energy_avg = energy_avg * cfg.beta + (1.0 - cfg.beta) * energy[t]
    return out, waH


def gev_weights_ref(Rt, Rn):
    """pybeamformer.py:1282-1307 transliteration (scipy generalized eigh)."""
    import scipy.linalg

    F, C = Rt.shape[0], Rt.shape[1]
    wqH = np.zeros((F, C), complex)
    for f in range(F):
        _, vecs = scipy.linalg.eigh(Rt[f], Rn[f])
        wqH[f] = vecs[:, -1]
        if f > 0:
            wqH[f] *= np.exp(-1j * np.angle(np.inner(wqH[f], np.conjugate(wqH[f - 1]))))
    return np.conjugate(wqH)
