"""Prototype design tests: reproduce the reference's shipped prototypes."""

import numpy as np
import pytest

from distant_speech_recognition_tpu.design.nyquist import (
    design_nyquist_analysis,
    design_nyquist_pair,
)
from distant_speech_recognition_tpu.utils.prototypes import (
    load_prototype,
    prototype_path,
)


def test_reproduces_shipped_m256_prototypes():
    """The Nyquist(M) design must match unit_test/prototype.ny exactly."""
    h, g = design_nyquist_pair(256, 4, 1)
    h_ref = load_prototype(prototype_path("h", 256, 4, 1))
    g_ref = load_prototype(prototype_path("g", 256, 4, 1))
    np.testing.assert_allclose(h, h_ref, atol=1e-10)
    np.testing.assert_allclose(g, g_ref, atol=1e-10)


@pytest.mark.parametrize("M,m,r", [(64, 4, 1), (32, 2, 1), (64, 4, 2)])
def test_design_reconstructs(M, m, r):
    """Designed pair achieves near-perfect reconstruction on white noise."""
    import jax

    from distant_speech_recognition_tpu.ops.filterbank import (
        FilterbankParams,
        analysis,
        synthesis,
    )

    h, g = design_nyquist_pair(M, m, r)
    params = FilterbankParams(M=M, m=m, r=r, delay_compensation_type=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(M * 80).astype(np.float32)
    y = np.asarray(synthesis(analysis(x, h, params), g, params))
    n = min(len(x), len(y))
    seg = slice(2 * params.N, n - 2 * params.N)
    err = y[:n][seg] - x[:n][seg]
    snr = 10 * np.log10((x[:n][seg] ** 2).mean() / (err**2).mean())
    # m=4 designs reach ~55 dB; short m=2 prototypes have a ~39 dB floor.
    assert snr > (40.0 if m >= 4 else 35.0), snr


def test_analysis_design_inband_aliasing_small():
    h, beta = design_nyquist_analysis(64, 4, 32)
    assert beta < 1e-4  # aliasing distortion must be tiny
    assert abs(np.linalg.norm(h) - 1.0) < 1e-9  # unit-norm eigenvector path


def test_dehaan_design_reconstructs():
    """de Haan LS design (AnalysisOversampledDFTDesign) reconstructs well
    through the oversampled filterbank (the reference's own check,
    tools/filterbank/test_oversampled_dft_filter.py with prototype.dh)."""
    from distant_speech_recognition_tpu.design.dehaan import design_dehaan_pair
    from distant_speech_recognition_tpu.ops.filterbank import (
        FilterbankParams,
        analysis,
        synthesis,
    )

    M, m, r = 64, 4, 1
    h, g = design_dehaan_pair(M, m, r, v=100.0)
    params = FilterbankParams(M=M, m=m, r=r, delay_compensation_type=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(M * 60).astype(np.float32)
    y = np.asarray(synthesis(analysis(x, h, params), g, params))
    n = min(len(x), len(y))
    seg = slice(2 * params.N, n - 2 * params.N)
    err = y[:n][seg] - x[:n][seg]
    snr = 10 * np.log10((x[:n][seg] ** 2).mean() / (err**2).mean())
    assert snr > 30.0, snr


def test_dehaan_errors_reported():
    from distant_speech_recognition_tpu.design.dehaan import design_dehaan_analysis

    h, (eps_p, eps_i) = design_dehaan_analysis(32, 4, 1)
    assert eps_p < -10 and eps_i < -10  # both errors well below 0 dB
    assert len(h) == 128
