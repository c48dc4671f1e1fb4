"""The batched paired-Pallas steered chain (round 5) == the vmapped
per-utterance XLA chain of `build_steered_pipeline` (BASELINE config 5:
SRP-PHAT DOA -> steered GSC-RLS -> Zelinski; beamformer.cc:2879-3211 into
SubbandGSCRLS steering)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def test_steered_pallas_matches_vmap_chain(rng):
    from distant_speech_recognition_tpu.models import steered as st
    from distant_speech_recognition_tpu.models.localization import (
        srp_phat_steering_table,
    )
    from distant_speech_recognition_tpu.models.pipeline import PipelineConfig
    from distant_speech_recognition_tpu.utils.geometry import calc_ca_delays
    from distant_speech_recognition_tpu.utils.prototypes import load_pair

    import jax

    C, B, T, fs = 4, 5, 12000, 16000.0
    h, g = load_pair(256, 4, 1)
    cfg = PipelineConfig(beamformer="gsc_rls", postfilter="zelinski",
                         pf_min_frames=2)
    ang = 2 * np.pi * np.arange(C) / C
    mpos = np.c_[100.0 * np.cos(ang), 100.0 * np.sin(ang), np.zeros(C)]
    thetas = [np.pi / 2]
    phis = np.deg2rad(np.arange(0.0, 360.0, 30.0))

    # place sources at grid directions so the DOA argmax is unambiguous
    x = np.zeros((B, C, T), np.float32)
    src = rng.standard_normal((B, T + 64)).astype(np.float32) * 1500
    for b in range(B):
        az = phis[(3 * b) % len(phis)]
        d = calc_ca_delays(mpos, az, np.pi / 2)
        for c in range(C):
            off = int(round(float(d[c]) * fs)) + 8
            x[b, c] = src[b, off : off + T]

    fn_ref = st.build_steered_pipeline(cfg, mpos, h, g, thetas, phis)
    y_ref, doa_ref = fn_ref(jnp.asarray(x))

    steering, grid = srp_phat_steering_table(mpos, 256, fs, thetas, phis)
    delay_table = np.stack(
        [calc_ca_delays(mpos, p, t) for t, p in np.asarray(grid)])
    fn_p = st._build_steered_pallas(
        cfg, h, g, jnp.asarray(steering), jnp.asarray(grid),
        jnp.asarray(delay_table, jnp.float32), fs, 256, interpret=True)
    y_p, doa_p = fn_p(jnp.asarray(x))

    np.testing.assert_array_equal(np.asarray(doa_p), np.asarray(doa_ref))
    y_ref, y_p = np.asarray(y_ref), np.asarray(y_p)
    assert y_p.shape == y_ref.shape
    np.testing.assert_allclose(y_p, y_ref, atol=2e-3 * np.abs(y_ref).max())
