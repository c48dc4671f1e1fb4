"""Compat pytdoa/pykalman: GCC-PHAT front end + EKF tracking on a simulated
plane wave recover the source direction (mirrors test_tdoa_estimator.py /
test_source_tracking.py driver loops)."""

import numpy as np

from distant_speech_recognition_tpu import compat
from distant_speech_recognition_tpu.compat.pykalman import IteratedExtendedKalmanFilter
from distant_speech_recognition_tpu.compat.pytdoa import make_tdoa_front_end
from distant_speech_recognition_tpu.utils.signal_generator import plane_wave_array, white_noise

FS = 16000
SSPEED = 343740.0


def _front_end(x, D=512, fftlen=1024, mpos=None, array_type="linear",
               pair_ids=None, **kw):
    spectra = []
    for c in range(x.shape[0]):
        sf = compat.SampleFeature(block_len=D, shift_len=D, pad_zeros=True)
        sf.set_samples(x[c], FS)
        ham = compat.feature.HammingFeature(sf)
        spectra.append(compat.feature.FFTFeature(ham, fft_len=fftlen))
    pair_ids = pair_ids or [(0, 1), (0, 2), (0, 3), (1, 3)]
    return make_tdoa_front_end(
        array_type=array_type, pair_ids=pair_ids, spec_sources=spectra,
        fftlen=fftlen, samplerate=FS, mpos=mpos,
        energy_threshold=kw.get("energy_threshold", 64),
        minimum_pairs=kw.get("minimum_pairs", 2),
        threshold=kw.get("threshold", 0.1), sspeed=SSPEED)


def _sim(az, C=4, spacing=60.0, T=FS):
    mpos = np.c_[np.arange(C) * spacing, np.zeros((C, 2))]
    src = white_noise(T, sigma=1000.0, seed=3)
    x = plane_wave_array(src, mpos[:, :2], az, samplerate=FS, sspeed=SSPEED, snr_db=20.0)
    return mpos, x


def test_linear_front_end_recovers_azimuth():
    az = np.pi / 3
    mpos, x = _sim(az)
    fe = _front_end(x, mpos=mpos, array_type="linear")
    ests = []
    for frame_no in range(16):
        obs = fe.next(frame_no)
        pos = fe.instantaneous_position(frame_no)
        if pos[0] > -1e9:
            assert obs is not None and len(obs) >= 2
            ests.append(pos[0])
    assert len(ests) >= 8
    est = np.median(ests)
    assert min(abs(est - az), abs(est - (np.pi - az))) < 0.08, est


def test_circular_front_end_recovers_direction():
    az, polar = 0.9, 1.2  # polar off the cos(theta)=0 boundary, where the
    # reference's closed form (pytdoa.py:518-581) degenerates under
    # one-sample TDOA quantization
    C = 4
    ang = np.arange(C) * 2 * np.pi / C
    mpos = np.c_[80.0 * np.cos(ang), 80.0 * np.sin(ang), np.zeros(C)]
    src = white_noise(FS, sigma=1000.0, seed=4)
    x = plane_wave_array(src, mpos[:, :2], az, polar=polar, samplerate=FS,
                         sspeed=SSPEED, snr_db=20.0)
    fe = _front_end(x, mpos=mpos, array_type="circular",
                    pair_ids=[(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    ests = []
    for frame_no in range(16):
        pos = fe.instantaneous_position(frame_no)
        if pos[0] > -1e9:
            ests.append(pos)
    assert len(ests) >= 8
    est = np.median(np.asarray(ests), axis=0)
    # planar (z=0 offsets) array observes theta up to reflection and phi up
    # to the reference's |cos| ambiguity
    assert abs(est[0] - polar) < 0.15 or abs(est[0] - (np.pi - polar)) < 0.15, est
    assert abs(abs(np.cos(est[1])) - abs(np.cos(az))) < 0.1, est


def test_iekf_tracks_static_source():
    az = np.pi / 3
    mpos, x = _sim(az, T=2 * FS)
    fe = _front_end(x, mpos=mpos, array_type="linear")
    # initialize from the first confident instantaneous estimate, as the
    # reference driver does (test_source_tracking.py:90-98)
    frame_no = 0
    while True:
        pos = fe.instantaneous_position(frame_no)
        frame_no += 1
        if pos[0] > -1e9:
            initial = pos
            break
    time_delta = 512 / FS
    trk = IteratedExtendedKalmanFilter(
        fe, F=np.eye(1), U=10.0 * np.eye(1), sigmaV2=4e-4, sigmaK2=1e10,
        time_delta=time_delta, initialXk=initial, gate_prob=0.95)
    trk.set_time(frame_no)
    states, observed = [], 0
    for k in range(frame_no, 40):
        Xk = trk.next(k)
        states.append(float(Xk[0]))
        observed += int(trk.is_observed())
    assert observed >= 20
    final = np.median(states[-10:])
    assert min(abs(final - az), abs(final - (np.pi - az))) < 0.08, final
