"""Interpret-mode equivalence of the Pallas WPE lag kernel.

The batched WPE path (ops/pallas_wpe.py + wpe_multichannel_batched) must be
numerically identical (f32 matmul reassociation only) to the per-utterance
einsum path `wpe_multichannel`, which is golden-tested against the compiled
reference C++ (tests/test_cpp_golden.py::test_wpe_*).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distant_speech_recognition_tpu.models.dereverberation import (
    wpe_multichannel,
    wpe_multichannel_batched,
)
from distant_speech_recognition_tpu.ops.pallas_wpe import (
    pallas_wpe_supported,
    wpe_resid_pallas,
    wpe_stats_pallas,
)


def test_pallas_wpe_supported_shapes():
    assert pallas_wpe_supported(4, 5)
    assert pallas_wpe_supported(2, 5)
    assert not pallas_wpe_supported(8, 8)


@pytest.mark.parametrize("C,F,T", [(4, 129, 300), (2, 65, 257)])
def test_wpe_stats_matches_einsum_path(rng, C, F, T):
    """R/r from the kernel == the einsum formulation, bin by bin."""
    from distant_speech_recognition_tpu.models.dereverberation import (
        SUBBAND_FLOOR,
        _lag_tensor,
    )
    from distant_speech_recognition_tpu.ops.complex_ops import ceinsum

    B, P, l0 = 2, 5, 2
    CP = C * P
    X = (rng.standard_normal((B, C, T, F))
         + 1j * rng.standard_normal((B, C, T, F))).astype(np.complex64)
    G = 0.1 * (rng.standard_normal((B, C, F, CP))
               + 1j * rng.standard_normal((B, C, F, CP))).astype(np.complex64)

    def ref_stats(Y, Gb):
        L = _lag_tensor(Y, l0, P)
        L = jnp.moveaxis(L, 0, -2).reshape(T, F, CP)
        valid = (jnp.arange(T) >= l0)[:, None]
        pred = ceinsum("cfp,tfp->ctf", jnp.conj(Gb), L)
        resid = Y - jnp.where(valid, pred, 0.0)
        theta = jnp.maximum(jnp.abs(resid), SUBBAND_FLOOR) ** 2
        w = jnp.where(valid, 1.0 / theta, 0.0)
        Lw = w[..., None].astype(L.dtype) * L[None]
        R = ceinsum("ctfp,tfq->cfpq", Lw, jnp.conj(L))
        r = ceinsum("ctf,tfp->cfp", (w.astype(Y.dtype) * jnp.conj(Y)), L)
        return R, r

    Rl, rl = zip(*(ref_stats(jnp.asarray(X[b]), jnp.asarray(G[b]))
                   for b in range(B)))
    Rref, rref = np.stack([np.asarray(v) for v in Rl]), np.stack(
        [np.asarray(v) for v in rl])
    Rp, rp = wpe_stats_pallas(jnp.asarray(X), jnp.asarray(G), l0, P,
                              interpret=True)
    # w spans ~6 decades (variance floor), so f32 accumulation-order noise
    # is the tolerance driver; both paths sit at the same distance from a
    # float64 ground truth (verified while deriving the kernel)
    np.testing.assert_allclose(np.asarray(Rp), Rref,
                               atol=2e-4 * np.abs(Rref).max())
    np.testing.assert_allclose(np.asarray(rp), rref,
                               atol=2e-4 * np.abs(rref).max())


def test_wpe_resid_matches_apply_pred(rng):
    from distant_speech_recognition_tpu.models.dereverberation import _lag_tensor
    from distant_speech_recognition_tpu.ops.complex_ops import ceinsum

    B, C, T, F, P, l0 = 2, 4, 300, 129, 5, 2
    CP = C * P
    X = (rng.standard_normal((B, C, T, F))
         + 1j * rng.standard_normal((B, C, T, F))).astype(np.complex64)
    G = 0.1 * (rng.standard_normal((B, C, F, CP))
               + 1j * rng.standard_normal((B, C, F, CP))).astype(np.complex64)

    def ref_resid(Y, Gb):
        L = _lag_tensor(Y, l0, P)
        L = jnp.moveaxis(L, 0, -2).reshape(T, F, CP)
        pred = ceinsum("cfp,tfp->ctf", jnp.conj(Gb), L)
        valid = (jnp.arange(T) >= l0)[:, None]
        return Y - jnp.where(valid, pred, 0.0)

    ref = np.stack([np.asarray(ref_resid(jnp.asarray(X[b]), jnp.asarray(G[b])))
                    for b in range(B)])
    got = np.asarray(wpe_resid_pallas(jnp.asarray(X), jnp.asarray(G), l0, P,
                                      interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())


@pytest.mark.parametrize("band_width", [0.0, 3000.0])
def test_wpe_multichannel_batched_matches_per_utterance(rng, band_width):
    """End-to-end batched WPE == vmapped per-utterance WPE (the
    golden-tested path), including the apply-time tap truncation and the
    band-limit mask."""
    B, C, T, F = 3, 4, 200, 129
    X = (rng.standard_normal((B, C, T, F))
         + 1j * rng.standard_normal((B, C, T, F))).astype(np.complex64)
    X = X * 30.0
    want = np.stack([
        np.asarray(wpe_multichannel(jnp.asarray(X[b]), 2, 6, 2,
                                    band_width=band_width))
        for b in range(B)
    ])
    got = np.asarray(wpe_multichannel_batched(
        jnp.asarray(X), 2, 6, 2, band_width=band_width, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-4 * np.abs(want).max())


def test_wpe_packed_tm_matches_batched(rng):
    """Packed-in/packed-out WPE == complex batched WPE on the same frames."""
    from distant_speech_recognition_tpu.models.dereverberation import (
        wpe_multichannel_packed_tm,
    )

    B, C, Tf, F = 2, 4, 150, 129
    M = 2 * (F - 1)
    X = 30 * (rng.standard_normal((B, C, Tf, F))
              + 1j * rng.standard_normal((B, C, Tf, F))).astype(np.complex64)
    X.imag[..., 0] = 0
    X.imag[..., -1] = 0
    want = np.asarray(wpe_multichannel_batched(
        jnp.asarray(X), 2, 6, 2, interpret=True))
    Yp = np.concatenate([X.real, X.imag[..., 1:F - 1]], axis=-1).astype(
        np.float32)
    Yp = np.moveaxis(Yp, 2, 0)  # [Tf, B, C, M]
    got_p = np.asarray(wpe_multichannel_packed_tm(
        jnp.asarray(Yp), F, 2, 6, 2, interpret=True))
    zero = np.zeros(got_p.shape[:-1] + (1,), np.float32)
    got = got_p[..., :F] + 1j * np.concatenate(
        [zero, got_p[..., F:], zero], axis=-1)
    got = np.moveaxis(got, 0, 2)  # [B, C, Tf, F]
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())
