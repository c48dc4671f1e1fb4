"""CLI mirror of src/beamformerMLC.cc (tools/beamformer_mlc.py): text
fixture formats, the far-field multi-source delay math, and the
GSC-with-linear-constraints -> Zelinski -> synthesis chain end to end."""

import glob
import math

import numpy as np
import pytest

DATA = "/root/reference/btk20_src/unit_test/data"
SOUNDSPEED = 343740.0


def _ref_delays(mpos, az, el):
    """Literal transliteration of calcTimeDelays (beamformerMLC.cc:167-180)."""
    c_x = -math.sin(el) * math.cos(az)
    c_y = -math.sin(el) * math.sin(az)
    c_z = -math.cos(el)
    return np.array([
        (c_x * p[0] + c_y * p[1] + c_z * p[2]) / SOUNDSPEED for p in mpos
    ])


def test_calc_time_delays_formula():
    from distant_speech_recognition_tpu.tools.beamformer_mlc import (
        calc_time_delays,
    )

    rng = np.random.default_rng(0)
    mpos = rng.uniform(-200, 200, size=(5, 3))
    positions = rng.uniform(0, np.pi, size=(3, 2))
    dT, dJ = calc_time_delays(1, mpos, positions)
    np.testing.assert_allclose(dT, _ref_delays(mpos, *positions[1]), atol=1e-15)
    assert dJ.shape == (2, 5)
    np.testing.assert_allclose(dJ[0], _ref_delays(mpos, *positions[0]), atol=1e-15)
    np.testing.assert_allclose(dJ[1], _ref_delays(mpos, *positions[2]), atol=1e-15)
    # single source -> no interference constraints
    _, none = calc_time_delays(0, mpos, positions[:1])
    assert none is None


@pytest.fixture(scope="module")
def mlc_fixtures(tmp_path_factory):
    """Text fixtures in the reference's formats + 1.5 s CMU audio list."""
    from distant_speech_recognition_tpu.utils.prototypes import load_pair
    from distant_speech_recognition_tpu.utils.wavio import read_wav, write_wav

    d = tmp_path_factory.mktemp("mlc")
    h, g = load_pair(256, 4, 1)
    coeff = str(d / "M256-m4-r1.txt")
    np.savetxt(coeff, np.concatenate([np.asarray(h), np.asarray(g)]))

    mpos = np.c_[np.arange(4) * 50.0, np.zeros((4, 2))]
    micpos = str(d / "array.txt")
    with open(micpos, "w") as fp:
        fp.write("4\n")
        for p in mpos:
            fp.write(f"{p[0]} {p[1]} {p[2]}\n")

    srcpos = str(d / "source_position.txt")
    with open(srcpos, "w") as fp:
        fp.write(f"0 {np.pi / 3} {np.pi / 2}\n")
        fp.write(f"1 {4 * np.pi / 3} {np.pi / 2}\n")

    paths = []
    for c in (1, 2, 3, 4):
        x, rate = read_wav(
            f"{DATA}/CMU/R1/M1005/KINECT/RAW/segmented/U1001_1M_16k_b16_c{c}.wav",
            normalize=False,
        )
        p = str(d / f"c{c}.wav")
        write_wav(p, x[0][:24000], rate, normalized=False)
        paths.append(p)
    alist = str(d / "testL")
    with open(alist, "w") as fp:
        fp.write("\n".join(paths) + "\n")
    return d, alist, micpos, coeff, srcpos


def test_beamformer_mlc_cli(mlc_fixtures, tmp_path):
    from distant_speech_recognition_tpu.tools import beamformer_mlc
    from distant_speech_recognition_tpu.utils.wavio import read_wav

    d, alist, micpos, coeff, srcpos = mlc_fixtures
    out = str(tmp_path / "out" / "beamformed.wav")
    beamformer_mlc.main([
        "-A", alist, "-P", micpos, "-C", coeff, "-S", srcpos,
        "-O", out, "-M", "256", "-i", "0",
    ])
    y, rate = read_wav(out, normalize=True)
    y = y[0]
    assert rate == 16000
    assert np.isfinite(y).all()
    # the driver peak-normalizes before writing (beamformerMLC.cc:305-311),
    # and the file is IEEE-float like the reference's (SF_FORMAT_FLOAT)
    assert np.abs(y).max() == pytest.approx(1.0, abs=1e-6)
    assert float((y.astype(np.float64) ** 2).mean()) > 1e-6


def test_beamformer_mlc_matches_direct_chain(mlc_fixtures):
    """The tool's output equals the hand-wired compat chain with the same
    MLC weights — pins the file parsing + NC constraint wiring."""
    from distant_speech_recognition_tpu.compat import beamformer as cb
    from distant_speech_recognition_tpu.compat import feature as cf
    from distant_speech_recognition_tpu.compat import modulated as cm
    from distant_speech_recognition_tpu.compat import postfilter as cp
    from distant_speech_recognition_tpu.tools import beamformer_mlc as t
    from distant_speech_recognition_tpu.utils.wavio import read_wav

    d, alist, micpos, coeff, srcpos = mlc_fixtures
    y = t.run(alist, micpos, coeff, srcpos, None, M=256, target_index=0)

    h, g = t.load_filter_coeffs(coeff)
    mpos = t.load_array_geometry(micpos)
    dT, dJ = t.calc_time_delays(0, mpos, t.load_source_positions(srcpos))
    with open(alist) as fp:
        paths = fp.read().split()
    bf = cb.SubbandGSC(fftLen=256)
    for p in paths:
        s = cf.SampleFeature(128, 128, pad_zeros=True)
        x, _ = read_wav(p, normalize=False)
        s.set_samples(x[0], 16000)
        bf.set_channel(cm.OverSampledDFTAnalysisBank(
            s, h, 256, 4, 1, delay_compensation_type=2))
    bf.calc_gsc_weights_n(16000.0, dT, dJ, NC=2)
    z = cp.ZelinskiPostFilter(bf, 256, 0.6, 2)
    z.set_beamformer(bf)
    syn = cm.OverSampledDFTSynthesisBank(z, g, 256, 4, 1,
                                         delay_compensation_type=2)
    want = np.concatenate([np.asarray(v, np.float32) for v in syn])
    want = want / (float(np.max(np.abs(want))) or 1.0)
    np.testing.assert_allclose(y, want, atol=1e-6)
