"""Streaming (chunked online) pipeline: equivalence with the batch pipeline
and checkpoint/resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from distant_speech_recognition_tpu.ops.filterbank import FilterbankParams, analysis, synthesis, hermitian_mirror
from distant_speech_recognition_tpu.models.pipeline import PipelineConfig, build_pipeline
from distant_speech_recognition_tpu.models.streaming import (
    StreamingEnhancer,
    analysis_init,
    synthesis_init,
    streaming_analysis,
    streaming_synthesis,
)
from distant_speech_recognition_tpu.utils.prototypes import load_pair


M, m, r = 32, 2, 1
P = FilterbankParams(M=M, m=m, r=r)


def _protos():
    return load_pair(M, m, r)


def _signal(C=3, T=4000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / 16000.0
    clean = np.sin(2 * np.pi * 440 * t)
    x = np.stack([
        np.roll(clean, k) + 0.1 * rng.standard_normal(T) for k in range(C)
    ]).astype(np.float32)
    return x


def test_streaming_analysis_matches_batch():
    h, g = _protos()
    x = _signal(C=1)[0]
    batch = np.asarray(analysis(jnp.asarray(x), jnp.asarray(h), P))

    st = analysis_init(P)
    outs = []
    # irregular chunk sizes (multiples of D)
    pos = 0
    for nb in [3, 1, 7, 2, 11]:
        chunk = x[pos : pos + nb * P.D]
        pos += nb * P.D
        st, f = streaming_analysis(st, jnp.asarray(chunk), jnp.asarray(h), P)
        outs.append(np.asarray(f))
    rest = x[pos:]
    pad = (-len(rest)) % P.D + P.analysis_delay * P.D
    st, f = streaming_analysis(
        st, jnp.asarray(np.concatenate([rest, np.zeros(pad, np.float32)])), jnp.asarray(h), P
    )
    outs.append(np.asarray(f))
    stream = np.concatenate(outs)[P.laN :]
    n = batch.shape[0]
    np.testing.assert_allclose(stream[:n], batch, atol=1e-4)


def test_streaming_synthesis_matches_batch():
    h, g = _protos()
    rng = np.random.default_rng(1)
    T = 60
    half = rng.standard_normal((T, M // 2 + 1)) + 1j * rng.standard_normal((T, M // 2 + 1))
    Y = np.asarray(hermitian_mirror(jnp.asarray(half.astype(np.complex64)), M))
    batch = np.asarray(synthesis(jnp.asarray(Y), jnp.asarray(g), P))

    st = synthesis_init(P)
    outs = []
    for sl in [slice(0, 13), slice(13, 14), slice(14, 40), slice(40, T)]:
        st, y = streaming_synthesis(st, jnp.asarray(Y[sl]), jnp.asarray(g), P)
        outs.append(np.asarray(y))
    stream = np.concatenate(outs)[P.synthesis_delay * P.D :]
    np.testing.assert_allclose(stream, batch, atol=1e-4)


@pytest.mark.parametrize("beamformer,postfilter", [
    ("ds", "none"),
    ("ds", "zelinski"),
    ("gsc_rls", "zelinski"),
])
def test_streaming_pipeline_matches_batch(beamformer, postfilter):
    h, g = _protos()
    C = 3
    x = _signal(C=C, T=3500)
    mpos = np.stack([np.arange(C) * 100.0, np.zeros(C), np.zeros(C)], axis=1)
    delays = np.arange(C) * 1e-5
    cfg = PipelineConfig(fb=P, beamformer=beamformer, postfilter=postfilter)

    batch = np.asarray(build_pipeline(cfg, mpos, delays, h, g)(jnp.asarray(x[None])))[0]

    se = StreamingEnhancer(cfg, mpos, delays, h, g, frames_per_chunk=16)
    outs = []
    pos = 0
    for n in [700, 123, 1011, 64, 1000]:
        outs.append(se.process(x[:, pos : pos + n]))
        pos += n
    outs.append(se.process(x[:, pos:]))
    outs.append(se.flush())
    stream = np.concatenate(outs)

    n = min(len(stream), len(batch))
    assert n >= len(batch) - P.D  # all but possibly a trailing partial block
    np.testing.assert_allclose(stream[:n], batch[:n], atol=2e-4)


def test_streaming_checkpoint_resume(tmp_path):
    from distant_speech_recognition_tpu.utils.checkpoint import save_pytree, load_pytree

    h, g = _protos()
    C = 3
    x = _signal(C=C, T=3000, seed=2)
    mpos = np.stack([np.arange(C) * 100.0, np.zeros(C), np.zeros(C)], axis=1)
    delays = np.arange(C) * 1e-5
    cfg = PipelineConfig(fb=P, beamformer="gsc_rls", postfilter="zelinski")

    # uninterrupted run
    se0 = StreamingEnhancer(cfg, mpos, delays, h, g, frames_per_chunk=16)
    ref = np.concatenate([se0.process(x), se0.flush()])

    # interrupted at sample 1300: checkpoint to disk, restore into a NEW object
    se1 = StreamingEnhancer(cfg, mpos, delays, h, g, frames_per_chunk=16)
    y1 = se1.process(x[:, :1300])
    path = str(tmp_path / "stream_ckpt.npz")
    save_pytree(path, se1.checkpoint())

    se2 = StreamingEnhancer(cfg, mpos, delays, h, g, frames_per_chunk=16)
    se2.restore(load_pytree(path))
    y2 = se2.process(x[:, 1300:])
    y3 = se2.flush()
    resumed = np.concatenate([y1, y2, y3])

    np.testing.assert_allclose(resumed, ref, atol=1e-6)


def test_streaming_full_chain_aec_wpe_matches_batch():
    """BASELINE config-4 online: NLMS-AEC + WPE-apply + GSC-RLS + Zelinski
    with carried state equals the batch pipeline, chunk-size independent.

    Streaming WPE is apply-only (the reference's estimate-then-stream
    protocol, test_subband_dereverberator.py:73-84): the filters are
    estimated from the same AEC-cancelled subbands the batch pipeline uses
    internally, then set via set_wpe_filters().
    """
    from distant_speech_recognition_tpu.models.aec import nlms_aec
    from distant_speech_recognition_tpu.models.dereverberation import wpe_estimate
    from distant_speech_recognition_tpu.ops.filterbank import analysis_half
    import jax

    h, g = _protos()
    C, T = 3, 3500
    x = _signal(C=C, T=T)
    rng = np.random.default_rng(11)
    play = (rng.standard_normal(T) * 0.5).astype(np.float32)
    x = x + 0.6 * np.roll(play, 7)[None, :]
    mpos = np.stack([np.arange(C) * 100.0, np.zeros(C), np.zeros(C)], axis=1)
    delays = np.arange(C) * 1e-5
    cfg = PipelineConfig(
        fb=P, beamformer="gsc_rls", postfilter="zelinski",
        aec="nlms", aec_delta=1.0, aec_epsilon=0.5, aec_threshold=1e-6,
        wpe=True, wpe_lower=2, wpe_upper=4, wpe_iterations=2,
    )

    batch = np.asarray(build_pipeline(cfg, mpos, delays, h, g)(
        jnp.asarray(x[None]), jnp.asarray(play[None])
    ))[0]

    # estimate WPE filters exactly as the batch pipeline does internally:
    # analysis -> per-channel NLMS -> wpe_estimate on the cancelled subbands
    subh = analysis_half(jnp.asarray(x), jnp.asarray(h, jnp.float32), P)
    Vh = analysis_half(jnp.asarray(play), jnp.asarray(h, jnp.float32), P)
    Eh = jax.vmap(lambda A: nlms_aec(Vh, A, 1.0, 0.5, 1e-6)[0])(subh)
    G = np.asarray(wpe_estimate(Eh, 2, 4, 2, -20.0))

    se = StreamingEnhancer(cfg, mpos, delays, h, g, frames_per_chunk=16)
    se.set_wpe_filters(G)
    outs = []
    pos = 0
    for n in [700, 123, 1011, 64, 1000]:
        outs.append(se.process(x[:, pos : pos + n], play[pos : pos + n]))
        pos += n
    outs.append(se.process(x[:, pos:], play[pos:]))
    outs.append(se.flush())
    stream = np.concatenate(outs)

    n = min(len(stream), len(batch))
    assert n >= len(batch) - P.D
    np.testing.assert_allclose(stream[:n], batch[:n], atol=2e-4)


def test_streaming_kalman_aec_matches_batch():
    """Round 3: the scalar-Kalman echo canceller carried in the chunk scan
    matches the batch pipeline, chunk-size independently (the per-frame
    recursion is identical, aec.cc:118-164)."""
    h, g = _protos()
    C, T = 3, 3500
    x = _signal(C=C, T=T)
    rng = np.random.default_rng(13)
    play = (rng.standard_normal(T) * 0.5).astype(np.float32)
    x = x + 0.6 * np.roll(play, 5)[None, :]
    mpos = np.stack([np.arange(C) * 100.0, np.zeros(C), np.zeros(C)], axis=1)
    delays = np.arange(C) * 1e-5
    cfg = PipelineConfig(
        fb=P, beamformer="gsc_rls", postfilter="zelinski",
        aec="kalman", aec_delta=0.95, aec_epsilon=1e-3, aec_threshold=1e-6,
    )
    batch = np.asarray(build_pipeline(cfg, mpos, delays, h, g)(
        jnp.asarray(x[None]), jnp.asarray(play[None])
    ))[0]

    for chunks in ([900, 2600], [333, 17, 2000, 64, 1086]):
        se = StreamingEnhancer(cfg, mpos, delays, h, g, frames_per_chunk=16)
        outs = []
        pos = 0
        for n in chunks:
            outs.append(se.process(x[:, pos : pos + n], play[pos : pos + n]))
            pos += n
        outs.append(se.process(x[:, pos:], play[pos:]))
        outs.append(se.flush())
        stream = np.concatenate(outs)
        n = min(len(stream), len(batch))
        assert n >= len(batch) - P.D
        np.testing.assert_allclose(stream[:n], batch[:n], atol=2e-4)


def test_streaming_wpe_reestimation():
    """Block-online WPE: at a re-estimation boundary the swapped-in filters
    equal wpe_estimate on exactly the carried context window, and the
    enhanced stream stays finite/valid."""
    from distant_speech_recognition_tpu.models.dereverberation import wpe_estimate

    h, g = _protos()
    C, T = 2, 4096
    x = _signal(C=C, T=T, seed=21)
    # synthetic reverberation so WPE has something to estimate
    tail = np.zeros(200)
    tail[60] = 0.5
    tail[120] = 0.3
    x = np.stack([
        np.convolve(xi, np.r_[1.0, tail])[: T] for xi in x
    ]).astype(np.float32)
    mpos = np.stack([np.arange(C) * 100.0, np.zeros(C), np.zeros(C)], axis=1)
    delays = np.arange(C) * 1e-5
    cfg = PipelineConfig(
        fb=P, beamformer="ds", postfilter="none",
        wpe=True, wpe_lower=1, wpe_upper=3, wpe_iterations=2,
    )

    every, ctx_frames, tc = 3, 96, 16
    se = StreamingEnhancer(cfg, mpos, delays, h, g, frames_per_chunk=tc)
    se.enable_wpe_reestimation(context_frames=ctx_frames, every_chunks=every)
    outs = [se.process(x)]
    outs.append(se.flush())
    stream = np.concatenate(outs)
    assert np.isfinite(stream).all() and len(stream) > 0

    # the last filters must equal a direct wpe_estimate on the final context
    assert se._wpe_ctx.shape[1] == ctx_frames
    n_boundary_chunks = (se._wpe_chunks // every) * every
    # reconstruct the context at the LAST boundary: frames seen in the first
    # n_boundary_chunks chunks, tail ctx_frames of them
    from distant_speech_recognition_tpu.ops.filterbank import analysis_half

    subh = np.asarray(analysis_half(jnp.asarray(x), jnp.asarray(h, jnp.float32), P))
    n_seen = n_boundary_chunks * tc
    ctx = subh[:, max(0, n_seen - ctx_frames) : n_seen, :]
    G_direct = np.asarray(wpe_estimate(jnp.asarray(ctx), 1, 3, 2))
    # apply the same tap-quirk mask set_wpe_filters applies
    Pn = 3 - 1 + 1
    tap_ok = np.tile(np.arange(Pn) < Pn - 1, C)
    G_direct = G_direct * tap_ok
    # float32 streamed-analysis vs batch-analysis rounding
    np.testing.assert_allclose(np.asarray(se._wpe_G), G_direct, rtol=2e-4, atol=3e-5)
