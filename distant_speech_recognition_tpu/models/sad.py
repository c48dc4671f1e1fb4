"""Speech activity detection (SAD/VAD).

Batched reformulation of the reference's sad/ subsystem (sad/sad.cc,
sad/sad_feature.cc, sad/ica.h): boolean VAD streams become whole-utterance
decision vectors; per-frame state machines (recursive energy, Ephraim-Malah
gain memory, head/tail hangover) become scans.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "simple_energy_vad",
    "simple_likelihood_ratio_vad",
    "energy_hangover_machine",
    "power_spectrum_metric",
    "normalized_energy_metric",
    "brightness",
    "energy_diffusion",
    "band_energy_ratio",
    "normalized_flux",
    "negative_entropy",
    "significant_subbands",
    "normalized_bandwidth",
    "pca",
    "fast_ica",
    "MLPVad",
]


def simple_energy_vad(X: jax.Array, threshold: float, gamma: float = 0.995):
    """Energy-ratio VAD (SimpleEnergyVAD::next, sad.cc:155-175).

    ``X``: complex spectra [T, M].  Speech when current frame energy exceeds
    ``threshold`` times the running average (recursion starts at 0, so frame
    0 compares against its own (1-gamma)-scaled energy, as in the reference).
    Returns bool [T].
    """
    energy = jnp.sum(jnp.abs(X) ** 2, axis=-1)

    def step(se, e):
        se = gamma * se + (1.0 - gamma) * e
        return se, e / se > threshold

    _, dec = jax.lax.scan(step, jnp.asarray(0.0, energy.dtype), energy)
    return dec


def _hyp1f1_m05_1(x):
    """1F1(-1/2, 1, -x) = (1+x) I0e(x/2) + x I1e(x/2) (Ephraim-Malah gain
    kernel; the exponential factors cancel with the scaled Bessels)."""
    half = x / 2.0
    return (1.0 + x) * jax.scipy.special.i0e(half) + x * jax.scipy.special.i1e(half)


def simple_likelihood_ratio_vad(
    X: jax.Array,
    noise_variance: jax.Array,
    threshold: float,
    alpha: float = 0.98,
):
    """Ephraim-Malah likelihood-ratio VAD
    (SimpleLikelihoodRatioVAD::next, sad.cc:231-264).

    Decision-directed a-priori SNR with the previous MMSE amplitude estimate
    carried per bin through a scan.  ``X``: [T, M]; ``noise_variance``: [M].
    Returns bool [T].
    """
    lam = jnp.asarray(noise_variance, jnp.float32)
    M = X.shape[-1]

    def step(prev_Ak, samp):
        Rk = jnp.abs(samp)
        gammak = Rk * Rk / lam
        xik = alpha * (prev_Ak**2 / lam) + (1.0 - alpha) * jnp.maximum(gammak - 1.0, 0.0)
        vk = (xik / (1.0 + xik)) * gammak
        Ak = (jnp.sqrt(jnp.pi) / 2.0) * (jnp.sqrt(vk) / jnp.maximum(gammak, 1e-20)) * _hyp1f1_m05_1(vk) * Rk
        logLR = jnp.sum(-jnp.log1p(xik) + gammak * xik / (1.0 + xik))
        return Ak, logLR / M > threshold

    # prev_Ak initialized to the noise floor (set_variance, sad.cc:211-223)
    _, dec = jax.lax.scan(step, jnp.sqrt(lam), X)
    return dec


def energy_hangover_machine(above: jax.Array, head_n: int = 4, tail_n: int = 10):
    """Head/tail hangover state machine (EnergyVADMetric::next,
    sad.cc:555-587): start recognizing after ``head_n`` consecutive
    above-threshold frames, stop after ``tail_n`` consecutive below.

    ``above``: bool [T] raw threshold decisions.  Returns the metric value
    per frame (1.0 above / 0.0 below, as the reference's return value).
    """

    def step(carry, a):
        recognizing, above_n, below_n = carry
        # recognizing branch
        below_n_r = jnp.where(a, 0, below_n + 1)
        stop = (~a) & (below_n_r == tail_n)
        # idle branch
        above_n_i = jnp.where(a, above_n + 1, 0)
        start = a & (above_n_i == head_n)

        new_recognizing = jnp.where(recognizing, ~stop, start)
        new_above = jnp.where(recognizing, jnp.where(stop, 0, above_n), above_n_i)
        new_below = jnp.where(recognizing, below_n_r, jnp.where(start, 0, below_n))
        return (new_recognizing, new_above, new_below), jnp.where(a, 1.0, 0.0)

    init = (jnp.asarray(False), jnp.asarray(0), jnp.asarray(0))
    _, out = jax.lax.scan(step, init, above)
    return out


def _band_power(spec: jax.Array, fftlen: int, low_x: int, high_x: int):
    """Power over [low_x, high_x] with the reference's doubling of interior
    bins (PowerSpectrumVADMetric::next, sad.cc:694-739).  spec: [..., F]."""
    F = spec.shape[-1]
    idx = jnp.arange(F)
    inband = (idx >= low_x) & (idx <= high_x)
    interior = (idx != 0) & (idx != fftlen // 2 + 1)
    w = jnp.where(inband, jnp.where(interior, 2.0, 1.0), 0.0)
    return jnp.sum(spec * w, axis=-1) / fftlen


def power_spectrum_metric(spectra: jax.Array, fftlen: int, low_x: int, high_x: int, E0: float = 1.0):
    """Channel-0 power ratio metric (PowerSpectrumVADMetric, sad.cc:694-739).

    ``spectra``: power spectra [C, T, F].  Returns +1/-1 per frame.
    """
    C = spectra.shape[0]
    p = _band_power(spectra, fftlen, low_x, high_x)  # [C, T]
    ratio = p[0] / jnp.sum(p, axis=0)
    return jnp.where(ratio > E0 / C, 1.0, -1.0)


def normalized_energy_metric(spectra: jax.Array, fftlen: int, low_x: int, high_x: int):
    """PowerSpectrumVADMetric with E0 = 1 (NormalizedEnergyMetric,
    sad.cc:766-800)."""
    return power_spectrum_metric(spectra, fftlen, low_x, high_x, E0=1.0)


# ---------------------------------------------------------------------------
# scalar SAD features (sad/sad_feature.cc) — all take [..., T, D] -> [..., T]
# ---------------------------------------------------------------------------

def brightness(spec: jax.Array, samplerate: float, weight: bool = False) -> jax.Array:
    """Spectral centroid (BrightnessFeature, sad_feature.cc:39-68) — the
    final (j = D-1) running value, normalized by D when unweighted."""
    D = spec.shape[-1]
    if weight:
        frs = (samplerate / 2.0 / D) * jnp.arange(1, D + 1)
        val = jnp.sum(frs * spec, axis=-1) / jnp.sum(spec, axis=-1)
    else:
        val = jnp.sum(jnp.arange(D) * spec, axis=-1) / jnp.sum(spec, axis=-1) / D
    return val


def energy_diffusion(spec: jax.Array) -> jax.Array:
    """Entropy of the L2-normalized spectrum (EnergyDiffusionFeature,
    sad_feature.cc:78-103)."""
    norm = jnp.sqrt(jnp.sum(spec**2, axis=-1, keepdims=True))
    nval = spec / norm
    return -jnp.sum(jnp.where(nval > 0, nval * jnp.log10(jnp.maximum(nval, 1e-30)), 0.0), axis=-1)


def band_energy_ratio(spec: jax.Array, samplerate: float, thresh_f: float = 0.0) -> jax.Array:
    """sqrt(low-band / high-band energy) (BandEnergyRatioFeature,
    sad_feature.cc:113-139)."""
    D = spec.shape[-1]
    max_f = samplerate / 2.0
    df = max_f / D
    tf = thresh_f if thresh_f > 0 else max_f / 2.0
    tx = int(np.floor(tf / df))
    lo = jnp.sum(spec[..., :tx] ** 2, axis=-1)
    hi = jnp.sum(spec[..., tx:] ** 2, axis=-1)
    return jnp.sqrt(lo / hi)


def _unit_normalize(x):
    """normalize() helper of sad_feature.cc: zero mean, unit variance
    (N-1 style deviation as NegativeEntropyFeature uses)."""
    D = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    dev = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) / (D - 1) - mean**2)
    return (x - mean) / dev


def normalized_flux(spec: jax.Array) -> jax.Array:
    """Frame-to-frame normalized spectral flux (NormalizedFluxFeature,
    sad_feature.cc:146-180); frame 0 -> 0."""
    w = _unit_normalize(spec)
    diff = w[..., 1:, :] - w[..., :-1, :]
    flux = jnp.sqrt(jnp.sum(diff**2, axis=-1))
    zero = jnp.zeros(flux.shape[:-1] + (1,), flux.dtype)
    return jnp.concatenate([zero, flux], axis=-1)


def negative_entropy(spec: jax.Array) -> jax.Array:
    """Negentropy via E[ln cosh] (NegativeEntropyFeature,
    sad_feature.cc:187-229)."""
    w = _unit_normalize(jnp.abs(spec))
    EGy = jnp.mean(jnp.log(jnp.cosh(w)), axis=-1)
    EGgy = 0.374576
    return 100.0 * (EGy - EGgy) ** 2


def significant_subbands(spec: jax.Array, thresh: float = 0.0) -> jax.Array:
    """Count of normalized bins above threshold (SignificantSubbandsFeature,
    sad_feature.cc:236-262)."""
    w = _unit_normalize(spec)
    return jnp.sum((w > thresh).astype(jnp.float32), axis=-1)


def normalized_bandwidth(spec: jax.Array, samplerate: float, thresh: float = 0.0) -> jax.Array:
    """Frequency span of normalized bins above threshold
    (NormalizedBandwidthFeature, sad_feature.cc)."""
    D = spec.shape[-1]
    df = samplerate / 2.0 / D
    w = _unit_normalize(spec)
    above = w > thresh
    idx = jnp.arange(D)
    first = jnp.min(jnp.where(above, idx, D), axis=-1)
    last = jnp.max(jnp.where(above, idx, -1), axis=-1)
    return jnp.maximum((last - first).astype(jnp.float32), 0.0) * df


# ---------------------------------------------------------------------------
# PCA / FastICA (sad/ica.h)
# ---------------------------------------------------------------------------

def pca(X: jax.Array, num_components: int | None = None):
    """PCA via eigendecomposition of the sample covariance (sad/ica.h:22-40).

    ``X``: [N, D] samples.  Returns (components [D, K], eigenvalues [K],
    mean [D]) sorted by descending eigenvalue.
    """
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    cov = Xc.T @ Xc / X.shape[0]
    w, v = jnp.linalg.eigh(cov)
    order = jnp.argsort(-w)
    w = w[order]
    v = v[:, order]
    if num_components is not None:
        w, v = w[:num_components], v[:, :num_components]
    return v, w, mean


def fast_ica(X: jax.Array, num_components: int, iterations: int = 200, seed: int = 0):
    """Deflation FastICA with the log-cosh contrast (sad/ica.h:44-68).

    ``X``: [N, D].  Returns unmixing matrix W [K, D] applied to whitened
    data: s = W (whiten(X)).
    """
    N, D = X.shape
    comps, eigvals, mean = pca(X, D)
    Xw = (X - mean) @ comps / jnp.sqrt(eigvals + 1e-12)  # whitened [N, D]

    key = jax.random.PRNGKey(seed)
    Winit = jax.random.normal(key, (num_components, D))

    def one_unit(carry, wi):
        Wprev = carry  # [K, D] rows already found (zero-padded)

        def body(w, _):
            wx = Xw @ w  # [N]
            g = jnp.tanh(wx)
            gp = 1.0 - g**2
            w_new = (Xw.T @ g) / N - jnp.mean(gp) * w
            # deflation: remove projections on previously found rows
            w_new = w_new - Wprev.T @ (Wprev @ w_new)
            return w_new / jnp.linalg.norm(w_new), None

        w, _ = jax.lax.scan(body, wi / jnp.linalg.norm(wi), None, length=iterations)
        return w

    W = jnp.zeros((num_components, D))
    for k in range(num_components):
        wk = one_unit(W, Winit[k])
        W = W.at[k].set(wk)
    return W, comps, eigvals, mean


@dataclasses.dataclass
class MLPVad:
    """Two-layer MLP speech/non-speech classifier over stacked context
    windows of cepstra (NeuralNetVAD, sad/sad.h:32-61 and
    sad/neural_spnsp_det.c:34-72): sigmoid hidden layer, softmax output,
    speech when P(speech) - P(nonspeech) > threshold."""

    W1: np.ndarray  # [in, hidden]
    b1: np.ndarray
    W2: np.ndarray  # [hidden, out]
    b2: np.ndarray
    threshold: float = 0.1
    context: int = 4

    def stack_context(self, cep: jax.Array) -> jax.Array:
        """[T, D] -> [T, (2*context+1)*D] edge-padded context windows."""
        c = self.context
        pad = jnp.concatenate([jnp.repeat(cep[:1], c, 0), cep, jnp.repeat(cep[-1:], c, 0)])
        T = cep.shape[0]
        cols = [jax.lax.dynamic_slice_in_dim(pad, i, T, 0) for i in range(2 * c + 1)]
        return jnp.concatenate(cols, axis=-1)

    def __call__(self, cep: jax.Array) -> jax.Array:
        x = self.stack_context(cep)
        hdn = jax.nn.sigmoid(x @ jnp.asarray(self.W1) + jnp.asarray(self.b1))
        out = jax.nn.softmax(hdn @ jnp.asarray(self.W2) + jnp.asarray(self.b2), axis=-1)
        return (out[..., 0] - out[..., 1]) > self.threshold
