"""Localization and tracking tests: GCC-PHAT delay recovery, SRP-PHAT DOA,
and EKF tracking on synthetic TDOA observations."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.models import localization as loc
from distant_speech_recognition_tpu.models import tracking as trk
from distant_speech_recognition_tpu.models import beamforming as bf
from distant_speech_recognition_tpu.ops.filterbank import stft_analysis


FFTLEN = 512
FS = 16000.0


def test_gcc_phat_recovers_known_delay(rng):
    """A pure integer-sample delay between two signals peaks at that lag."""
    T = 4096
    x = rng.standard_normal(T).astype(np.float32)
    d = 7
    y = np.roll(x, d)
    X1 = np.fft.rfft(x.reshape(4, 1024), axis=-1)[:, : FFTLEN // 2 + 1]
    X2 = np.fft.rfft(y.reshape(4, 1024), axis=-1)[:, : FFTLEN // 2 + 1]
    # use a self-consistent fftlen for irfft
    cc = np.asarray(loc.gcc_phat(X1.astype(np.complex64), X2.astype(np.complex64), 1024, energy_threshold=0.0))
    delays, heights = loc.tdoa_peaks(cc, FS)
    delays = np.asarray(delays)
    # x1 lags x2 by -d samples: y[t] = x[t-d] so delay of x vs y is -d/fs... the
    # peak appears at +d for cross_spectrum X1 X2*
    np.testing.assert_allclose(np.abs(delays) * FS, d, atol=0.5)
    assert np.all(np.asarray(heights) > 0.12)


def test_gcc_phat_energy_gate(rng):
    X1 = np.zeros((3, 9), np.complex64)
    X2 = np.zeros((3, 9), np.complex64)
    cc = np.asarray(loc.gcc_phat(X1, X2, 16, energy_threshold=64.0))
    assert np.all(cc == 0)


def test_tdoa_feature_vector_gating(rng):
    delays = rng.standard_normal((5, 6)).astype(np.float32)
    heights = np.full((5, 6), 0.05, np.float32)
    heights[2, :3] = 0.5
    heights[4, :] = 0.5
    _, valid, frame_valid = loc.tdoa_feature_vectors(delays, heights, threshold=0.12, minimum_pairs=2)
    valid, frame_valid = np.asarray(valid), np.asarray(frame_valid)
    assert frame_valid.tolist() == [False, False, True, False, True]
    assert valid[2].sum() == 3


def test_srp_phat_finds_source_direction(rng):
    """Plane wave from a known direction wins the SRP grid search."""
    C = 6
    # circular array, radius 100 mm
    ang = np.linspace(0, 2 * np.pi, C, endpoint=False)
    mpos = np.c_[100 * np.cos(ang), 100 * np.sin(ang), np.zeros(C)]
    from distant_speech_recognition_tpu.utils.geometry import calc_ca_delays

    M = 64
    true_theta, true_phi = np.pi / 2, 0.9
    delays = calc_ca_delays(mpos, true_phi, true_theta)
    vs = np.asarray(bf.array_manifold(M, FS, delays))  # [F, C]
    T = 10
    s = (rng.standard_normal((T, M // 2 + 1)) + 1j * rng.standard_normal((T, M // 2 + 1)))
    X = (vs[None] * C * s[:, :, None]).astype(np.complex64)  # [T, F, C]

    thetas = [np.pi / 2]
    phis = np.linspace(-np.pi, np.pi, 72, endpoint=False)
    steering, grid = loc.srp_phat_steering_table(mpos, M, FS, thetas, phis)
    srp = np.asarray(loc.srp_phat(X, steering, min_bin=1))
    best = np.asarray(grid)[srp.mean(axis=0).argmax()]
    err = np.angle(np.exp(1j * (best[1] - true_phi)))
    assert abs(err) < 0.1, (best, true_phi)


def _simulate_tdoa_track(rng, T=100):
    """Source moving slowly; observations = pair TDOAs + noise."""
    C = 5
    mpos = np.c_[np.arange(C) * 150.0, np.zeros(C), np.zeros(C)]  # mm
    pairs = loc.mic_pairs(C)
    pos0 = np.array([800.0, 1500.0, 0.0])
    vel = np.array([3.0, -2.0, 0.0])
    positions = pos0[None] + np.arange(T)[:, None] * vel[None]
    delays = np.stack(
        [np.asarray(loc.pair_tdoa_model(p.astype(np.float32), mpos, pairs)) for p in positions]
    )
    delays += rng.standard_normal(delays.shape) * 2e-6
    return mpos, pairs, positions, delays.astype(np.float32)


def test_ekf_tracks_moving_source(rng):
    mpos, pairs, positions, delays = _simulate_tdoa_track(rng)
    T, P = delays.shape
    cfg = trk.TrackerConfig(sigmaV2=1e-9, sigmaK2=1e4, time_delta=1.0)
    F_mat = np.eye(3)
    U = np.eye(3) * 10.0
    mask = np.ones((T, P), bool)
    frame_valid = np.ones(T, bool)
    track = np.asarray(
        trk.ekf_track(cfg, F_mat, U, positions[0] + [100, -150, 30], mpos, pairs, delays, mask, frame_valid)
    )
    final_err = np.linalg.norm(track[-1] - positions[-1])
    init_err = np.linalg.norm(positions[0] + [100, -150, 30] - positions[0])
    assert final_err < 0.5 * init_err, (final_err, init_err)


def test_iekf_tracks_and_gating_rejects_outliers(rng):
    mpos, pairs, positions, delays = _simulate_tdoa_track(rng)
    T, P = delays.shape
    # inject gross outliers at some frames
    bad = [20, 40, 60]
    delays_bad = delays.copy()
    delays_bad[bad] += 5e-3
    F_mat = np.eye(3)
    U = np.eye(3) * 10.0
    mask = np.ones((T, P), bool)
    frame_valid = np.ones(T, bool)
    x0 = positions[0] + [50, -50, 0]

    def run(gate_prob, iters):
        cfg = trk.TrackerConfig(
            sigmaV2=1e-9, sigmaK2=1e4, gate_prob=gate_prob, num_iterations=iters
        )
        return np.asarray(
            trk.iekf_track(cfg, F_mat, U, x0, mpos, pairs, delays_bad, mask, frame_valid)
        )

    err_ungated = np.linalg.norm(run(0.0, 3)[-1] - positions[-1])
    err_gated = np.linalg.norm(run(0.95, 3)[-1] - positions[-1])
    # innovation gating must strongly limit the damage from gross outliers
    assert err_gated < 0.25 * err_ungated, (err_gated, err_ungated)


def test_gcc_weighted_modes_and_peak(rng):
    T, F = 8, 257
    fftlen = 512
    x = rng.standard_normal((T, fftlen)).astype(np.float32)
    d = 5
    y = np.roll(x, d, axis=-1)
    X1 = np.fft.rfft(x, axis=-1).astype(np.complex64)
    X2 = np.fft.rfft(y, axis=-1).astype(np.complex64)
    N1, N2, G12 = loc.noise_spectra(X1 * 0.01, X2 * 0.01, np.ones(T, bool))
    for mode in ["raw", "phat", "gnn_sub", "gnn_sub_phat", "mlr_raw", "mlr_gnn_sub"]:
        cc = np.asarray(
            loc.gcc_weighted(X1, X2, fftlen, mode=mode, Gn1n2=np.asarray(G12),
                             N1=np.asarray(N1), N2=np.asarray(N2))
        )
        delay, peak = loc.find_cc_peak(cc, 16000.0)
        est = np.asarray(delay) * 16000.0
        np.testing.assert_allclose(est, -d, atol=0.5), mode  # X1 conj(X2) peaks at -d


def test_find_cc_peak_delay_window(rng):
    cc = np.zeros((1, 64), np.float32)
    cc[0, 5] = 1.0   # +5 samples
    cc[0, 60] = 2.0  # -4 samples (larger peak)
    # unrestricted: picks -4
    delay, _ = loc.find_cc_peak(cc, 1.0, interpolate=False)
    assert np.asarray(delay)[0] == -4
    # restricted to positive delays: picks +5
    delay, _ = loc.find_cc_peak(cc, 1.0, min_delay=0.0, interpolate=False)
    assert np.asarray(delay)[0] == 5


def test_mcc_localizer_finds_azimuth(rng):
    """MCCC cost is maximal at the true plane-wave azimuth."""
    from distant_speech_recognition_tpu.utils.signal_generator import plane_wave_array

    mpos_1d = np.arange(4) * 100.0  # mm
    src = rng.standard_normal(8000).astype(np.float32)
    true_az = 1.1
    x = plane_wave_array(src, mpos_1d.reshape(-1, 1), azimuth=0.0, polar=true_az)
    # linear-array convention: steer over azimuth with calc_la_delays
    grid, az = loc.linear_array_delay_grid(mpos_1d, 72)
    # simulate with matching convention: delays = -pos*cos(az)/c
    from distant_speech_recognition_tpu.utils.geometry import calc_la_delays

    d = calc_la_delays(mpos_1d.reshape(-1, 1), true_az)
    T = len(src)
    S = np.fft.rfft(src)
    freqs = np.fft.rfftfreq(T, 1 / 16000.0)
    x = np.stack([
        np.fft.irfft(S * np.exp(-2j * np.pi * freqs * di), n=T) for di in d
    ]).astype(np.float32)

    best, mccc = loc.mcc_localize(x, grid, num_best=3)
    est = az[int(np.asarray(best)[0])]
    assert abs(est - true_az) < 0.15, (est, true_az)
    assert np.asarray(mccc).max() > 0.9


def test_linear_srp_doa_recovers_plane_wave(rng):
    """Plane wave on a linear array: the sin-grid SRP argmax lands on the
    wave's propagation direction (LinearArraySRPDOAEstimator analogue)."""
    C, M = 8, 64
    xpos = np.arange(C) * 40.0  # mm
    azimuth = 2.0  # radians from the +x array axis
    from distant_speech_recognition_tpu.utils.geometry import calc_la_delays

    delays = calc_la_delays(xpos.reshape(-1, 1), azimuth)
    vs = np.asarray(bf.array_manifold(M, FS, delays))  # [F, C], exp(-j2pi f d)/C
    T = 6
    s = rng.standard_normal((T, M // 2 + 1)) + 1j * rng.standard_normal((T, M // 2 + 1))
    X = (vs[None] * C * s[:, :, None]).astype(np.complex64)  # [T, F, C]

    steering, sin_grid = loc.linear_srp_steering_table(xpos, M, FS)
    assert steering.shape[1:] == (M // 2 + 1, C)
    doa, srp = loc.linear_srp_doa(X, steering, sin_grid)
    doa = np.asarray(doa)
    # manifold delays are -x cos(az)/c relative to the middle mic, so the
    # matched grid point satisfies sin(theta) = -cos(azimuth)
    want = np.arcsin(np.clip(-np.cos(azimuth), -1, 1))
    step = float(sin_grid[1] - sin_grid[0])
    assert np.all(np.abs(np.sin(doa) - np.sin(want)) <= step), (doa, want)


def _golden_srp_dsbla(X, W, fbin_min, fbin_max, thr, n_best):
    import jax.numpy as jnp  # noqa: F401  (kept local; see tests below)
    """Frame-loop transliteration of DOAEstimatorSRPDSBLA::next +
    get_nbest_hypotheses_from_accrp_ (beamformer.cc:3093-3197)."""
    T, F, C = X.shape
    G = W.shape[0]
    fftlen2 = F - 1
    acc = np.zeros(G)
    for t in range(T):
        energy = 0.0
        for f in range(fbin_min, fbin_max + 1):
            tot = np.sum(np.abs(X[t, f]) ** 2)
            energy += (2.0 if f < fftlen2 else 1.0) * tot * tot
        energy /= 2.0 * fftlen2 * C
        if energy < thr:
            continue
        for gidx in range(G):
            rp = 0.0
            for f in range(fbin_min, fbin_max + 1):
                v = np.vdot(W[gidx, f], X[t, f])
                rp += (2.0 if f < fftlen2 else 1.0) * abs(v) ** 2
            acc[gidx] += rp / (fbin_max - fbin_min + 1.0)
    order = np.argsort(-acc)[:n_best]
    return order, acc


def test_srp_dsbla_matches_protocol_transliteration(rng):
    from distant_speech_recognition_tpu.models.localization import srp_dsbla

    T, F, C, G = 12, 9, 3, 5
    X = (rng.standard_normal((T, F, C)) + 1j * rng.standard_normal((T, F, C))).astype(np.complex64)
    X[3] *= 1e-4  # one near-silent frame: must be gated out
    W = (rng.standard_normal((G, F, C)) + 1j * rng.standard_normal((G, F, C))).astype(np.complex64)
    thr = 1e-3
    import jax.numpy as jnp
    idx, acc, ok = srp_dsbla(jnp.asarray(X), jnp.asarray(W), 1, None, thr, 3)
    g_idx, g_acc = _golden_srp_dsbla(X, W, 1, F - 1, thr, 3)
    np.testing.assert_allclose(np.asarray(acc), g_acc, rtol=2e-5)
    assert list(np.asarray(idx)) == list(g_idx)
    assert not bool(np.asarray(ok)[3])  # silent frame skipped


def test_srp_dsbla_robust_to_silence_padding():
    """On a silence-padded utterance the energy-gated accumulation ignores
    the noise-only tail (the reference's robustness property), while the
    ungated sum integrates the noise."""
    from distant_speech_recognition_tpu.models.localization import srp_dsbla
    from distant_speech_recognition_tpu.models.beamforming import array_manifold
    from distant_speech_recognition_tpu.utils import geometry

    M, C = 64, 4
    F = M // 2 + 1
    fs = 16000.0
    rng = np.random.default_rng(3)
    mpos_x = np.arange(C)[:, None] * 50.0
    true_delays = np.asarray(geometry.calc_la_delays(mpos_x, azimuth=1.1))
    vs = np.asarray(array_manifold(M, fs, true_delays))  # [F, C]

    # 10 speech frames from the true direction + 40 diffuse noise-only frames
    S = (rng.standard_normal((10, F)) + 1j * rng.standard_normal((10, F))) * 5
    speech = S[:, :, None] * np.conj(vs)[None] * C  # plane wave at true DOA
    noise = 0.3 * (rng.standard_normal((40, F, C)) + 1j * rng.standard_normal((40, F, C)))
    X = np.concatenate([speech, noise]).astype(np.complex64)

    grid = np.linspace(0.2, 1.4, 13)
    W = np.stack([
        np.asarray(array_manifold(M, fs, geometry.calc_la_delays(mpos_x, azimuth=a)))
        for a in grid
    ])  # [G, F, C] wq convention

    # threshold between noise-frame and speech-frame energies
    import jax.numpy as jnp
    idx, acc, ok = srp_dsbla(jnp.asarray(X), jnp.asarray(W), 1, None, 1.0, 1)
    got = grid[int(np.asarray(idx)[0])]
    assert int(np.asarray(ok).sum()) == 10  # only the speech frames counted
    assert abs(got - 1.1) < 0.11, got
