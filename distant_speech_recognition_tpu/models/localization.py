"""Source localization: GCC-PHAT TDOA estimation and SRP-PHAT DOA search.

Batched reformulation of the reference's TDOA/localization stack
(lib/pytdoa.py, tde/tde.cc, localization/localization.cc,
beamformer/beamformer.cc DOA estimators): all frames and all microphone
pairs are processed at once; the (theta, phi) steering grid of the SRP
search is one einsum over a precomputed manifold table.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gcc_phat",
    "tdoa_peaks",
    "tdoa_feature_vectors",
    "pair_tdoa_model",
    "pair_tdoa_jacobian",
    "srp_phat_steering_table",
    "srp_phat",
    "mic_pairs",
]


def mic_pairs(num_mics: int) -> list[tuple[int, int]]:
    """All unordered microphone pairs, reference ordering
    (make_tdoa_front_end, pytdoa.py:593-632)."""
    return list(itertools.combinations(range(num_mics), 2))


def gcc_phat(
    X1: jax.Array,
    X2: jax.Array,
    fftlen: int,
    energy_threshold: float = 64.0,
) -> jax.Array:
    """PHAT-weighted generalized cross-correlation per frame
    (PHATFeature.next, pytdoa.py:32-55).

    ``X1``/``X2``: half-band spectra ``[..., T, F]`` with ``F = fftlen//2+1``.
    Returns time-domain GCC ``[..., T, fftlen]``.  Frames where *both*
    channels' energy (2 sum |X|^2) is at or below the threshold return zeros.
    """
    cross = X1 * jnp.conj(X2)
    mag = jnp.abs(cross)
    cs = cross / jnp.where(mag > 0, mag, 1.0)
    cc = jnp.fft.irfft(cs, n=fftlen, axis=-1)
    e1 = 2.0 * jnp.sum(jnp.abs(X1) ** 2, axis=-1)
    e2 = 2.0 * jnp.sum(jnp.abs(X2) ** 2, axis=-1)
    active = (e1 > energy_threshold) | (e2 > energy_threshold)
    return jnp.where(active[..., None], cc, 0.0)


def tdoa_peaks(cc: jax.Array, samplerate: float) -> tuple[jax.Array, jax.Array]:
    """Highest |CC| peak per frame -> (delay seconds, peak height)
    (TDOAFeature.next, pytdoa.py:87-114).

    ``cc``: ``[..., T, fftlen]``.  Lags above fftlen/2 wrap to negative
    delays.  Frames with all-zero CC give (0 delay, 0 height).
    """
    fftlen = cc.shape[-1]
    mag = jnp.abs(cc)
    idx = jnp.argmax(mag, axis=-1)
    height = jnp.take_along_axis(mag, idx[..., None], axis=-1)[..., 0]
    lag = jnp.where(idx < fftlen // 2, idx, idx - fftlen)
    delay = lag.astype(jnp.float32) / samplerate
    return delay, height


def tdoa_feature_vectors(
    delays: jax.Array,
    heights: jax.Array,
    threshold: float = 0.12,
    minimum_pairs: int = 2,
):
    """Gate pair TDOAs by CC peak height and the minimum-pair requirement
    (TDOAFeatureVector.next, pytdoa.py:267-288).

    ``delays``/``heights``: ``[..., T, P]`` per mic pair.  Returns
    ``(delays, valid_mask [..., T, P], frame_valid [..., T])`` — a fixed-size
    masked representation of the reference's variable-length observation
    lists (TPU-friendly static shapes).
    """
    valid = heights > threshold
    frame_valid = jnp.sum(valid.astype(jnp.int32), axis=-1) >= minimum_pairs
    return delays, valid, frame_valid


def pair_tdoa_model(x, mpos, pairs, c: float = 343000.0):
    """Predicted TDOA for each pair given source position ``x`` (3-vector)
    (TDOAFeatureVector.tdoa, pytdoa.py:213-227).  Returns [P]."""
    mpos = jnp.asarray(mpos, jnp.float32)
    i1 = jnp.asarray([p[0] for p in pairs])
    i2 = jnp.asarray([p[1] for p in pairs])
    d1 = jnp.linalg.norm(x - mpos[i1], axis=-1)
    d2 = jnp.linalg.norm(x - mpos[i2], axis=-1)
    return (d1 - d2) / c


def pair_tdoa_jacobian(x, mpos, pairs, c: float = 343000.0):
    """d tdoa / d x for each pair (TDOAFeatureVector.linearize,
    pytdoa.py:248-264).  Returns [P, 3]."""
    mpos = jnp.asarray(mpos, jnp.float32)
    i1 = jnp.asarray([p[0] for p in pairs])
    i2 = jnp.asarray([p[1] for p in pairs])
    diff1 = x - mpos[i1]
    diff2 = x - mpos[i2]
    D1 = jnp.linalg.norm(diff1, axis=-1, keepdims=True)
    D2 = jnp.linalg.norm(diff2, axis=-1, keepdims=True)
    return (diff1 / D1 - diff2 / D2) / c


def srp_phat_steering_table(
    mpos,
    fftlen: int,
    samplerate: float,
    thetas,
    phis,
    sspeed: float = 343740.0,
):
    """Precompute the D&S steering table over a (theta, phi) grid
    (DOAEstimatorSRPDSBLA steering table; beamformer.cc:2879-3211).

    Returns ``(wqH [G, F, C], grid [G, 2])`` where G = len(thetas)*len(phis).
    """
    from .beamforming import array_manifold
    from ..utils.geometry import calc_ca_delays

    mpos = np.asarray(mpos, dtype=np.float64)
    grid = np.array([(t, p) for t in np.atleast_1d(thetas) for p in np.atleast_1d(phis)])
    tables = []
    for theta, phi in grid:
        delays = calc_ca_delays(mpos, phi, theta, sspeed)
        tables.append(np.conj(np.asarray(array_manifold(fftlen, samplerate, delays))))
    return jnp.asarray(np.stack(tables)), jnp.asarray(grid, jnp.float32)


@partial(jax.jit, static_argnums=())
def srp_phat(
    X: jax.Array,
    steering: jax.Array,
    min_bin: int = 0,
    max_bin: int | None = None,
) -> jax.Array:
    """Steered response power with PHAT weighting over all grid points.

    ``X``: snapshots ``[..., T, F, C]``; ``steering``: ``[G, F, C]``.
    Returns SRP ``[..., T, G]`` — argmax over G gives the DOA estimate.
    PHAT: each bin's snapshot is magnitude-normalized before steering so
    every bin votes equally (getSrpPhat, localization/localization.cc).
    """
    mag = jnp.abs(X)
    Xn = X / jnp.where(mag > 0, mag, 1.0)
    Y = jnp.einsum("gfc,...tfc->...tgf", steering, Xn)
    p = jnp.abs(Y) ** 2
    F = X.shape[-2]
    lo = min_bin
    hi = F if max_bin is None else max_bin
    mask = (jnp.arange(F) >= lo) & (jnp.arange(F) < hi)
    return jnp.sum(jnp.where(mask, p, 0.0), axis=-1)
