"""Interpret-mode equivalence of the Pallas AEC scan kernels.

The VMEM-resident NLMS/Kalman scans (ops/pallas_aec.py) must match the XLA
`lax.scan` cancellers (models/aec.py), which are golden-tested against the
compiled reference C++ (tests/test_cpp_golden.py::test_aec_matches_cpp).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from distant_speech_recognition_tpu.models.aec import kalman_aec, nlms_aec
from distant_speech_recognition_tpu.ops.pallas_aec import aec_scan_pallas


def _pack(X):
    """[.., F] complex -> packed [.., M] real with M = 2*(F-1)."""
    F = X.shape[-1]
    return np.concatenate([X.real, X.imag[..., 1:F - 1]], axis=-1).astype(
        np.float32
    )


def _unpack(P, F):
    zero = np.zeros(P.shape[:-1] + (1,), np.float32)
    im = np.concatenate([zero, P[..., F:], zero], axis=-1)
    return P[..., :F] + 1j * im


@pytest.mark.parametrize("kind,p1,p2", [("nlms", 100.0, 1e-4),
                                        ("kalman", 0.95, 1e-3)])
def test_aec_scan_pallas_matches_xla(rng, kind, p1, p2):
    M, C, Tf, B = 256, 4, 21, 3  # deliberately not tile multiples
    F = M // 2 + 1
    V = (rng.standard_normal((Tf, B, 1, F))
         + 1j * rng.standard_normal((Tf, B, 1, F))).astype(np.complex64) * 30
    A = (rng.standard_normal((Tf, B, C, F))
         + 1j * rng.standard_normal((Tf, B, C, F))).astype(np.complex64) * 30
    # DC/Nyquist imag are structurally zero in the packed layout
    V.imag[..., 0] = 0
    V.imag[..., -1] = 0
    A.imag[..., 0] = 0
    A.imag[..., -1] = 0
    fn = nlms_aec if kind == "nlms" else kalman_aec
    want, _ = fn(jnp.asarray(V), jnp.asarray(A), p1, p2, 100.0)
    want = np.asarray(want)

    got_p = np.asarray(aec_scan_pallas(
        jnp.asarray(_pack(A)), jnp.asarray(_pack(V)), kind, p1, p2, 100.0,
        frame_tile=4, batch_tile=2, interpret=True,
    ))
    got = _unpack(got_p, F)
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())
