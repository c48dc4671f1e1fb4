"""Speech activity detection (SAD/VAD).

Batched reformulation of the reference's sad/ subsystem (sad/sad.cc,
sad/sad_feature.cc, sad/ica.h): boolean VAD streams become whole-utterance
decision vectors; per-frame state machines (recursive energy, Ephraim-Malah
gain memory, head/tail hangover) become scans.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "simple_energy_vad",
    "simple_likelihood_ratio_vad",
    "energy_hangover_machine",
    "power_spectrum_metric",
    "normalized_energy_metric",
    "energy_vad_metric",
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

    [sic] the emitted value is the RAW per-frame decision: the reference's
    ``next`` returns 1.0/0.0 from the threshold test alone in both branches
    (sad.cc:562-586); the recognizing/head/tail state only latches
    internally and never alters the returned metric.  The state machine is
    carried here so the recursion stays faithful, not to gate the output.
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


def energy_vad_metric(
    frames: jax.Array,
    initial_energy: float = 5.0e7,
    threshold: float = 0.5,
    head_n: int = 4,
    tail_n: int = 10,
    energies_n: int = 200,
):
    """EnergyVADMetric: percentile-tracked noise-floor energy detector with
    the head/tail hangover machine (sad.cc:301-366, 555-600).

    Per frame: energy = sum of squares; compare against the
    ``threshold``-quantile of a sliding buffer of ``energies_n`` past noise
    energies (initialized to ``initial_energy``); the buffer only absorbs
    frames while fully out of speech (recognizing false AND no head count),
    exactly as ``above_threshold_`` does.  ``frames``: [T, D] float sample
    blocks.  Returns the per-frame metric (1.0 / 0.0, sad.cc:555-600).
    """
    median_x = int(threshold * energies_n)
    e = jnp.sum(jnp.asarray(frames, jnp.float32) ** 2, axis=-1)

    class S(NamedTuple):
        energies: jax.Array  # [energies_n]
        above_n: jax.Array  # int32
        below_n: jax.Array  # int32
        recognizing: jax.Array  # bool

    def step(s, sum_t):
        thr = jnp.sort(s.energies)[median_x]
        above = sum_t > thr
        absorb = jnp.logical_and(jnp.logical_not(s.recognizing), s.above_n == 0)
        energies = jnp.where(
            absorb, jnp.concatenate([s.energies[1:], sum_t[None]]), s.energies
        )

        # state machine (sad.cc:562-600)
        def rec_case():
            below_new = jnp.where(above, 0, s.below_n + 1)
            stop = jnp.logical_and(jnp.logical_not(above), below_new == tail_n)
            return S(
                energies=energies,
                above_n=jnp.where(stop, 0, s.above_n),
                below_n=below_new,
                recognizing=jnp.logical_not(stop),
            ), jnp.where(above, 1.0, 0.0)

        def idle_case():
            # the idle branch scores 1.0 on EVERY above-threshold frame,
            # not only when the head count completes (sad.cc:577-586)
            above_new = jnp.where(above, s.above_n + 1, 0)
            start = above_new == head_n
            return S(
                energies=energies,
                above_n=above_new,
                below_n=jnp.where(start, 0, s.below_n),
                recognizing=start,
            ), jnp.where(above, 1.0, 0.0)

        s_rec, m_rec = rec_case()
        s_idle, m_idle = idle_case()
        pick = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(s.recognizing, x, y), a, b
        )
        return pick(s_rec, s_idle), jnp.where(s.recognizing, m_rec, m_idle)

    s0 = S(
        energies=jnp.full((energies_n,), initial_energy, jnp.float32),
        above_n=jnp.asarray(0, jnp.int32),
        below_n=jnp.asarray(0, jnp.int32),
        recognizing=jnp.asarray(False),
    )
    _, metric = jax.lax.scan(step, s0, e)
    return metric


def _band_power(spec: jax.Array, fftlen: int, low_x: int, high_x: int):
    """Power over [low_x, high_x] with the reference's doubling of interior
    bins (PowerSpectrumVADMetric::next, sad.cc:694-739).  spec: [..., F].

    [sic] the single-weight index is ``fftLen/2 + 1`` exactly as in the
    reference (``fbinX == fftLen2_ + 1`` with fftLen2_ = fftLen/2,
    sad.cc:715) — unreachable for a half spectrum, so the Nyquist bin is
    hermitian-doubled like an interior bin there too."""
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
    # input normalization (Mlp_Post, neural_spnsp_det.c:51-73: the stacked
    # context vector is normalized as (f - mean) / var — by the VARIANCE,
    # not the deviation, exactly as the reference computes it)
    mean: np.ndarray | None = None
    var: np.ndarray | None = None
    # decision rule: "diff" = P(sp) - P(nsp) > threshold (generic mode);
    # "p0" = P(sp) >= threshold (Neural_Spnsp_Det, neural_spnsp_det.c:38-39)
    decision: str = "diff"

    @classmethod
    def from_spnsp_file(cls, path: str, featdim: int, context: int = 4,
                        nhidden: int = 100, noutput: int = 2,
                        threshold: float = 0.5) -> "MLPVad":
        """Load a trained speech/non-speech net in the reference's text
        weight format (Read_Mlp_Param, neural_spnsp_det.c:132-196):

            <label> n_w1   then n_w1 floats, u2-major (hidden-major)
            <label> n_w2   then n_w2 floats
            <label> n_b1 / n_b2 + biases
            <label> featdim + per-feature means
            <label> featdim + per-feature variances

        The mean/var are per base feature and tiled over the context window.
        """
        toks = open(path).read().split()
        pos = 0

        def take_block(expect_n):
            nonlocal pos
            n = int(toks[pos + 1])
            if n != expect_n:
                raise ValueError(f"size mismatch in {path}: {n} != {expect_n}")
            vals = np.asarray([float(v) for v in toks[pos + 2 : pos + 2 + n]],
                              np.float32)
            pos += 2 + n
            return vals

        nin = featdim * (2 * context + 1)
        w1 = take_block(nin * nhidden).reshape(nhidden, nin).T  # u2-major file
        w2 = take_block(nhidden * noutput).reshape(noutput, nhidden).T
        b1 = take_block(nhidden)
        b2 = take_block(noutput)
        mean = np.tile(take_block(featdim), 2 * context + 1)
        var = np.tile(take_block(featdim), 2 * context + 1)
        return cls(W1=w1, b1=b1, W2=w2, b2=b2, threshold=threshold,
                   context=context, mean=mean, var=var, decision="p0")

    def stack_context(self, cep: jax.Array) -> jax.Array:
        """[T, D] -> [T, (2*context+1)*D] edge-padded context windows."""
        c = self.context
        pad = jnp.concatenate([jnp.repeat(cep[:1], c, 0), cep, jnp.repeat(cep[-1:], c, 0)])
        T = cep.shape[0]
        cols = [jax.lax.dynamic_slice_in_dim(pad, i, T, 0) for i in range(2 * c + 1)]
        return jnp.concatenate(cols, axis=-1)

    def __call__(self, cep: jax.Array) -> jax.Array:
        x = self.stack_context(cep)
        if self.mean is not None:
            x = (x - jnp.asarray(self.mean)) / jnp.asarray(self.var)
        hdn = jax.nn.sigmoid(x @ jnp.asarray(self.W1) + jnp.asarray(self.b1))
        out = jax.nn.softmax(hdn @ jnp.asarray(self.W2) + jnp.asarray(self.b2), axis=-1)
        if self.decision == "p0":
            return out[..., 0] >= self.threshold
        return (out[..., 0] - out[..., 1]) > self.threshold


# ---------------------------------------------------------------------------
# VADMetric family extensions (sad/sad.h:187-660)
# ---------------------------------------------------------------------------

def _band_weights(F_half: int, fftlen: int, low_x: int, high_x: int):
    idx = jnp.arange(F_half)
    inband = (idx >= low_x) & (idx <= high_x)
    interior = (idx != 0) & (idx != fftlen // 2 + 1)
    return jnp.where(inband, jnp.where(interior, 2.0, 1.0), 0.0)


def _cggd_loglhood(X, sigma, shape_f: float):
    """Complex generalized-Gaussian log-likelihood with scale tied to sigma
    (ComplexGeneralizedGaussian::logLhood).  shape_f = 1 is the complex
    Gaussian."""
    sigma2 = jnp.maximum(sigma**2, 1e-20)
    f = shape_f
    # scale B chosen so E|X|^2 = sigma^2 under CGGD(f)
    lgB = (
        jax.scipy.special.gammaln(1.0 / f)
        - jax.scipy.special.gammaln(2.0 / f)
    )  # log of Gamma(1/f)/Gamma(2/f)
    B = jnp.exp(lgB)
    norm = jnp.log(f) - jnp.log(jnp.pi * B * sigma2) - jax.scipy.special.gammaln(1.0 / f)
    return norm - (jnp.abs(X) ** 2 / (B * sigma2)) ** f


def negentropy_metric(
    X: jax.Array,
    envelope: jax.Array,
    fftlen: int,
    shape_f: float = 0.5,
    threshold: float = 0.0,
    low_x: int = 0,
    high_x: int | None = None,
):
    """Negentropy VAD metric (NegentropyVADMetric::calc_negentropy,
    sad.cc:1132-1171): per-bin log-likelihood ratio between a generalized
    Gaussian and a Gaussian with the spectral-envelope variance; interior
    bins doubled, normalized by the band size.

    ``X``: [T, F] complex; ``envelope``: [T, F] (variance).  Returns
    (decision bool [T], metric [T]).
    """
    F = X.shape[-1]
    hx = F - 1 if high_x is None else high_x
    sigma = jnp.sqrt(jnp.maximum(envelope, 1e-20))
    lr = _cggd_loglhood(X, sigma, shape_f) - _cggd_loglhood(X, sigma, 1.0)
    w = _band_weights(F, fftlen, low_x, hx)
    metric = jnp.sum(lr * w, axis=-1) / jnp.sum(w)
    return metric > threshold, metric


def mutual_information_metric(
    X1: jax.Array,
    X2: jax.Array,
    env1: jax.Array,
    env2: jax.Array,
    fftlen: int,
    alpha: float = 0.95,
    threshold: float = 0.0,
    low_x: int = 0,
    high_x: int | None = None,
):
    """Mutual-information VAD metric under jointly-Gaussian bins
    (MutualInformationVADMetric, sad.cc with Gaussian marginals/joint):
    per-bin MI = -log(1 - |rho|^2) - ... evaluated empirically as
    joint - marginal1 - marginal2 with a recursively tracked complex
    correlation coefficient rho (ccs_ recursion).

    Returns (decision [T], metric [T]).
    """
    F = X1.shape[-1]
    hx = F - 1 if high_x is None else high_x
    s1 = jnp.sqrt(jnp.maximum(env1, 1e-20))
    s2 = jnp.sqrt(jnp.maximum(env2, 1e-20))
    u1 = X1 / s1
    u2 = X2 / s2

    def step(rho, inputs):
        a, b = inputs
        rho_new = alpha * rho + (1 - alpha) * a * jnp.conj(b)
        return rho_new, rho_new

    _, rhos = jax.lax.scan(step, jnp.zeros(F, X1.dtype), (u1, u2))
    r2 = jnp.clip(jnp.abs(rhos) ** 2, 0.0, 0.999)
    # Gaussian empirical MI contribution per bin
    cross = 2.0 * jnp.real(u1 * jnp.conj(u2) * jnp.conj(rhos)) - r2 * (
        jnp.abs(u1) ** 2 + jnp.abs(u2) ** 2
    )
    mutual = -jnp.log1p(-r2) + cross / (1.0 - r2)
    w = _band_weights(F, fftlen, low_x, hx)
    metric = jnp.sum(mutual * w, axis=-1) / jnp.sum(w)
    return metric > threshold, metric


def mutual_information_metric_exact(
    X1,
    X2,
    env1,
    env2,
    fftlen: int,
    samplerate: float = 16000.0,
    low_cutoff: float = 187.0,
    high_cutoff: float = 1000.0,
    shape_factors=None,
    beta: float = 0.95,
):
    """Reference-exact mutual-information VAD metric
    (MutualInformationVADMetric::calc_mutual_information, sad.cc:1464-1525),
    verified against the compiled C++ (tests/test_cpp_golden_tail.py).

    Per bin: empirical MI = joint CGGD log-likelihood minus both marginal
    CGGD log-likelihoods, with the joint shape factor found by the
    reference's entropy-matching bisection (match_, sad.cc:1352-1377), a
    recursively tracked complex correlation rho (used BEFORE this frame's
    update; beta forgetting; |rho| clipped to 1 - epsilon_, epsilon 0.10),
    interior bins doubled, normalized by binN.

    ``X1``/``X2``: [T, F] complex subband frames; ``env1``/``env2``: [T, F]
    spectral-envelope variances; ``shape_factors``: per-bin marginal shape
    (None -> Gaussian 2.0).  Returns metric [T] (numpy, sequential scan —
    this is a parity oracle; `mutual_information_metric` is the batched
    compute path).
    """
    from scipy.special import gammaln
    from scipy.special import gamma as sp_gamma

    X1 = np.asarray(X1)
    X2 = np.asarray(X2)
    env1 = np.asarray(env1, np.float64)
    env2 = np.asarray(env2, np.float64)
    fftLen2 = fftlen // 2
    F = fftLen2 + 1
    lowX = int((low_cutoff / samplerate) * fftlen) if low_cutoff >= 0 else 0
    highX = (
        int((high_cutoff / samplerate) * fftlen + 0.5)
        if high_cutoff >= 0
        else fftLen2
    )
    binN = 2 * (highX - lowX + 1) if lowX > 0 else 2 * (highX - lowX) + 1
    f = (
        np.full(F, 2.0)
        if shape_factors is None
        else np.asarray(shape_factors, np.float64)
    )

    Bc = np.exp((gammaln(2.0 / f) - gammaln(4.0 / f)) / 2.0)
    norm_m = np.log(f / (2.0 * np.pi * Bc**2 * sp_gamma(2.0 / f)))

    def match_score_marginal(ff):
        Bc2 = np.exp(gammaln(2.0 / ff) - gammaln(4.0 / ff))
        return -(2.0 * ((2.0 / ff) - np.log(ff / (2.0 * np.pi * Bc2 * sp_gamma(2.0 / ff)))))

    def match_score_joint(fJ):
        BJ4 = np.exp((gammaln(4.0 / fJ) - gammaln(6.0 / fJ)) * 2.0)
        return -((4.0 / fJ) - np.log(fJ / (8.0 * np.pi**2 * BJ4 * sp_gamma(4.0 / fJ))))

    def match(ff):
        a, c = ff / 3.0, 2.0
        m = match_score_marginal(ff)
        while True:
            b = (a + c) / 2.0
            rb = match_score_joint(b)
            if abs(m - rb) < 1.0e-6:
                return b
            if rb > m:
                a = b
            else:
                c = b

    fJ = np.array([match(fi) for fi in f])
    BJ = np.exp((gammaln(4.0 / fJ) - gammaln(6.0 / fJ)) / 2.0)
    norm_j = np.log(fJ / (8.0 * np.pi**2 * BJ**4 * sp_gamma(4.0 / fJ)))

    idx = np.arange(F)
    w = np.where(
        (idx >= lowX) & (idx <= highX),
        np.where((idx == 0) | (idx == fftLen2 + 1), 1.0, 2.0),
        0.0,
    )

    T = X1.shape[0]
    rho = np.zeros(F, complex)
    out = np.empty(T)
    for t in range(T):
        s1 = np.sqrt(env1[t])
        s2 = np.sqrt(env2[t])
        det = s1**2 * s2**2 * (1.0 - np.abs(rho) ** 2)
        sigma12 = rho * s1 * s2
        s_val = (
            s2**2 * np.abs(X1[t]) ** 2
            + s1**2 * np.abs(X2[t]) ** 2
            - 2.0 * np.real(sigma12 * np.conj(X1[t]) * X2[t])
        ) / det
        ssqrt = np.sqrt(np.abs(s_val))
        lhood_j = norm_j - (ssqrt / (np.sqrt(2.0) * BJ)) ** fJ - np.log(det)
        m1 = norm_m - (np.abs(X1[t]) / (s1 * Bc)) ** f - 2.0 * np.log(s1)
        m2 = norm_m - (np.abs(X2[t]) / (s2 * Bc)) ** f - 2.0 * np.log(s2)
        out[t] = np.sum(w * (lhood_j - m1 - m2)) / binN
        cross = X1[t] * np.conj(X2[t]) / (s1 * s2)
        rho = beta * rho + (1.0 - beta) * cross
        mag = np.abs(rho)
        clip = mag >= 0.90
        rho = np.where(clip, rho * (0.90 / np.where(clip, mag, 1.0)), rho)
    return out


def likelihood_ratio_metric_exact(
    X1,
    X2,
    env1,
    env2,
    fftlen: int,
    samplerate: float = 16000.0,
    low_cutoff: float = 187.0,
    high_cutoff: float = 1000.0,
    shape_factors=None,
):
    """Reference-exact two-channel likelihood-ratio VAD metric
    (LikelihoodRatioVADMetric::calc_likelihood_ratio, sad.cc:1567-1617),
    verified against the compiled C++: per bin
    ``lr = logLhood(X1, sigma) - logLhood(X2, sigma)`` under the marginal
    CGGD with the POOLED scale ``sigma = sqrt((env1 + env2)/2)``, interior
    bins doubled, normalized by binN.  Returns metric [T]."""
    from scipy.special import gammaln
    from scipy.special import gamma as sp_gamma

    X1 = np.asarray(X1)
    X2 = np.asarray(X2)
    fftLen2 = fftlen // 2
    F = fftLen2 + 1
    lowX = int((low_cutoff / samplerate) * fftlen) if low_cutoff >= 0 else 0
    highX = (
        int((high_cutoff / samplerate) * fftlen + 0.5)
        if high_cutoff >= 0
        else fftLen2
    )
    binN = 2 * (highX - lowX + 1) if lowX > 0 else 2 * (highX - lowX) + 1
    f = (
        np.full(F, 2.0)
        if shape_factors is None
        else np.asarray(shape_factors, np.float64)
    )
    Bc = np.exp((gammaln(2.0 / f) - gammaln(4.0 / f)) / 2.0)
    sigma = np.sqrt(
        (np.asarray(env1, np.float64) + np.asarray(env2, np.float64)) / 2.0
    )
    # the 2 log sigma and normalization terms cancel in the ratio
    lr = (np.abs(X2) / (sigma * Bc)) ** f - (np.abs(X1) / (sigma * Bc)) ** f
    idx = np.arange(F)
    w = np.where(
        (idx >= lowX) & (idx <= highX),
        np.where((idx == 0) | (idx == fftLen2 + 1), 1.0, 2.0),
        0.0,
    )
    return np.sum(w * lr, axis=-1) / binN


def ccc_metric(
    spectra: jax.Array,
    fftlen: int,
    threshold: float = 0.1,
    num_candidates: int = 5,
    low_x: int = 0,
    high_x: int | None = None,
    reference_nbest: bool = False,
):
    """Cross-correlation-coefficient VAD metric (CCCVADMetric, sad.cc):
    PHAT cross-spectrum between channel 0 and every other channel, inverse
    FFT, average of N CC peaks per channel pair.

    ``spectra``: [C, T, F] half band.  Returns (decision [T], metric [T]).

    ``reference_nbest=False`` (default): a PRINCIPLED top-N peak pick;
    speech when the mean metric exceeds the threshold.
    ``reference_nbest=True``: bit-replicates the reference's peak loop
    (sad.cc:913-938), whose insertion ``break``s after slot 0 every time:
    when ``cc > list[N-1]`` it either shifts-and-inserts at the top (if
    ``cc > list[0]``) or OVERWRITES slot 0 in place, losing the old top —
    not a top-N (verified against the compiled C++) — seeded with
    ``cc[0]``, and the reference's INVERTED decision (next() returns 1.0
    when the metric is BELOW the threshold, sad.cc:967-970).
    """
    C = spectra.shape[0]
    F = spectra.shape[-1]
    hx = F - 1 if high_x is None else high_x
    idx = jnp.arange(F)
    band = (idx >= low_x) & (idx <= hx)
    ref = spectra[0]
    total = 0.0
    for c in range(1, C):
        cc_spec = jnp.conj(ref) * spectra[c]
        mag = jnp.abs(cc_spec)
        cc_spec = jnp.where(band, cc_spec / jnp.where(mag > 0, mag, 1.0), 0.0)
        cc = jnp.fft.irfft(cc_spec, n=fftlen, axis=-1)
        if reference_nbest:
            lst0 = jnp.concatenate(
                [cc[:, :1], jnp.full((cc.shape[0], num_candidates - 1), -1e10)],
                axis=1,
            )

            def step(lst, cc_t):
                qual = cc_t > lst[:, -1]
                top = cc_t > lst[:, 0]
                shifted = jnp.concatenate([cc_t[:, None], lst[:, :-1]], axis=1)
                slot0 = jnp.concatenate([cc_t[:, None], lst[:, 1:]], axis=1)
                new = jnp.where(top[:, None], shifted, slot0)
                return jnp.where(qual[:, None], new, lst), None

            lst, _ = jax.lax.scan(step, lst0, jnp.swapaxes(cc[:, 1:], 0, 1))
            total = total + jnp.mean(lst, axis=-1)
        else:
            top = jax.lax.top_k(cc, num_candidates)[0]
            total = total + jnp.mean(top, axis=-1)
    metric = total / (C - 1)
    if reference_nbest:
        return metric < threshold, metric
    return metric > threshold, metric


def low_full_band_energy_ratio_metric(frames: jax.Array, lowpass=None,
                                      order: int = 2):
    """Low/full band energy ratio via short autocorrelation
    (LowFullBandEnergyRatioVADMetric, sad.cc:1649-1701), reference-exact
    (verified vs the compiled C++):

    - per-lag-normalized autocorrelation ``r[lag] = sum_{i>=lag} x_i
      x_{i-lag} / (N - lag)`` (calc_auto_correlation_vector_),
    - lower-band energy ``w^T Toeplitz(r) w`` through a scratch vector the
      reference NEVER zeroes between frames (``dgemv`` with beta=1,
      sad.cc:1687-1690) — the quadratic forms accumulate over ALL frames
      seen so far, reproduced here as a cumulative sum,
    - metric = accumulated lower-band energy / this frame's ``r[0]``.

    ``frames``: [T, N]; ``lowpass``: [L] FIR taps (default: a flat
    ``ones(order+1)/(order+1)``).  Returns metric [T].
    """
    if lowpass is None:
        lowpass = jnp.ones(order + 1) / (order + 1)
    w = jnp.asarray(lowpass, jnp.float64 if frames.dtype == jnp.float64 else jnp.float32)
    L = w.shape[0]
    N = frames.shape[-1]
    r = jnp.stack(
        [
            jnp.sum(frames[..., lag:] * frames[..., : N - lag], axis=-1) / (N - lag)
            for lag in range(L)
        ],
        axis=-1,
    )  # [T, L]
    absdiff = jnp.abs(jnp.arange(L)[:, None] - jnp.arange(L)[None, :])
    ww = w[:, None] * w[None, :]  # [L, L]
    quad = jnp.einsum("ij,...tij->...t", ww, r[..., absdiff])
    le = jnp.cumsum(quad, axis=-1)
    return le / jnp.where(r[..., 0] != 0.0, r[..., 0], 1.0)


def tsps_metric(spectra: jax.Array, fftlen: int, low_x: int, high_x: int,
                E0: float = 1.0):
    """Target-signal-power-spectrum metric (TSPSVADMetric, sad.cc:
    ``TSPS = log(P0 / (Ptot - P0)) - log(E0 / Ptot)``, +1/-1 decision).

    ``spectra``: power spectra [C, T, F]."""
    p = _band_power(spectra, fftlen, low_x, high_x)  # [C, T]
    total = jnp.sum(p, axis=0)
    tgt = p[0]
    tsps = jnp.log(tgt / jnp.maximum(total - tgt, 1e-20)) - jnp.log(E0 / jnp.maximum(total, 1e-20))
    return jnp.where(tsps > 0, 1.0, -1.0), tsps


def hangover_fusion(metrics, head_n: int = 4, tail_n: int = 10, votes: int | None = None):
    """Multi-metric hangover fusion (HangoverMultiStageVADFeature,
    sad.h:665-771): a frame is 'above' when at least ``votes`` metrics are
    positive; the head/tail machine smooths the fused decision.

    ``metrics``: list of [T] arrays with positive-means-speech polarity.
    """
    stack = jnp.stack([jnp.asarray(m) > 0 for m in metrics])
    need = votes if votes is not None else stack.shape[0]
    above = jnp.sum(stack.astype(jnp.int32), axis=0) >= need
    return energy_hangover_machine(above, head_n, tail_n)
