"""Generalized Gaussian densities (real GGD / complex CGGD) + parameter fits.

The reference keeps these as accumulate/update classes driven one sample at a
time (lib/pyggd.py: GGaussianD, MME4GGaussianD, MLE4GGaussianD;
lib/pycggd.py: CGGaussianD, MLE4CGGaussianD) — they model subband amplitude
statistics for the HOS/negentropy beamformers (models/hos.py) and the
negentropy VAD (models/sad.py).  Here each density is a vectorized
log-pdf/entropy over arbitrary-shaped arrays, and each estimator is one
whole-buffer update: the reference's per-sample accumulators are plain sums,
so ``acc(x) for x in data; update()`` collapses to closed-form reductions
with identical math (flooring, gradient step schedule, convergence test).

Parameterization (GGaussianD.fixConst, pyggd.py:43-57):
    A(p, sigma)  = sigma * sqrt(Gamma(1/p) / Gamma(3/p))
    log N(p, A)  = -log(2 Gamma(1 + 1/p) A)
    log pdf(x)   = log N - |x - mean|^p / A^p
    H(sigma)     = log(2 Gamma(1+1/p)) + 1/p + 0.5 log(Gamma(1/p)/Gamma(3/p))
                   + log(sigma)

Complex case (CGGaussianD.fixConst, pycggd.py:46-61):
    B(p)        = Gamma(1/p) / Gamma(2/p)
    log pdf(X)  = log p - log(pi Gamma(1/p) B) - log(sa)
                  - (|X - mean|^2 / (sa B))^p
    H(sa)       = log(pi Gamma(1/p) B) - log p + 1/p + log(sa)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

__all__ = [
    "ggd_log_prob",
    "ggd_entropy",
    "cggd_log_prob",
    "cggd_entropy",
    "GGDParams",
    "CGGDParams",
    "fit_ggd_mme",
    "fit_ggd_mle",
    "fit_cggd_mle",
    "write_ggd_param",
    "read_ggd_param",
]

LZERO = -1.0e10


class GGDParams(NamedTuple):
    """Real GGD parameters (GGaussianD state: sigma scale, p shape, mean)."""

    sigma: jax.Array
    p: jax.Array
    mean: jax.Array


class CGGDParams(NamedTuple):
    """Complex GGD parameters (CGGaussianD: sa scaling factor, p shape)."""

    sa: jax.Array
    p: jax.Array
    mean: jax.Array


def _gamma_ratio_log(a: float | jax.Array, b: float | jax.Array):
    """log(Gamma(a) / Gamma(b)) via lngamma (pycggd.py:50-53 does the same
    to stay finite for small shape parameters)."""
    return gammaln(a) - gammaln(b)


def ggd_log_prob(x, p, sigma, mean=0.0, scale=None):
    """Log-density of the real generalized Gaussian (GGaussianD.prob,
    pyggd.py:91-103).

    With ``scale=None`` the density's own ``sigma`` scales it; passing
    ``scale`` substitutes a per-sample scale (the reference's ``sigma!=0``
    branch used when a running variance estimate replaces the global one).
    """
    p = jnp.asarray(p, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    logA = jnp.log(sigma) + 0.5 * _gamma_ratio_log(1.0 / p, 3.0 / p)
    lNF = -(jnp.log(2.0) + gammaln(1.0 + 1.0 / p) + logA)
    if scale is None:
        return lNF - jnp.exp(p * (jnp.log(jnp.abs(x - mean) + 1e-38) - logA))
    # C = sqrt(Gamma(3/p)/Gamma(1/p)); |x-mean| C / scale
    logC = 0.5 * _gamma_ratio_log(3.0 / p, 1.0 / p)
    z = jnp.log(jnp.abs(x - mean) + 1e-38) + logC - jnp.log(scale)
    return lNF + jnp.log(sigma) - jnp.log(scale) - jnp.exp(p * z)


def ggd_entropy(p, sigma):
    """Differential entropy of the real GGD (GGaussianD.entropy via NgConst,
    pyggd.py:54-56,105-113); ``sigma <= 0`` returns LZERO like the reference."""
    p = jnp.asarray(p, jnp.float32)
    ng = (
        jnp.log(2.0)
        + gammaln(1.0 + 1.0 / p)
        + 1.0 / p
        + 0.5 * _gamma_ratio_log(1.0 / p, 3.0 / p)
    )
    return jnp.where(sigma > 0, ng + jnp.log(jnp.maximum(sigma, 1e-38)), LZERO)


def cggd_log_prob(x, p, sa, mean=0.0, scale=None):
    """Log-density of the complex GGD (CGGaussianD.prob, pycggd.py:90-106)."""
    p = jnp.asarray(p, jnp.float32)
    sa = jnp.asarray(sa, jnp.float32)
    logB = _gamma_ratio_log(1.0 / p, 2.0 / p)
    llconst = jnp.log(p) - (jnp.log(jnp.pi) + gammaln(1.0 / p) + logB)
    s = sa if scale is None else scale
    x2 = jnp.abs(x - mean) ** 2
    val = jnp.exp(p * (jnp.log(x2 + 1e-38) - jnp.log(s) - logB))
    return llconst - jnp.log(s) - val


def cggd_entropy(p, sa):
    """Differential entropy of the complex GGD (CGGaussianD.entropy via
    NgConst, pycggd.py:57-58,108-117)."""
    p = jnp.asarray(p, jnp.float32)
    lnf = jnp.log(jnp.pi) + gammaln(1.0 / p) + _gamma_ratio_log(1.0 / p, 2.0 / p)
    ng = lnf - jnp.log(p) + 1.0 / p
    return jnp.where(sa > 0, ng + jnp.log(jnp.maximum(sa, 1e-38)), LZERO)


def fit_ggd_mme(x, zero_mean: bool = True) -> GGDParams:
    """Moment-matching fit of the real GGD (MME4GGaussianD.update,
    pyggd.py:213-255): ``sigma = sqrt(E[(x-m)^2])`` and the shape solved
    from ``Mp = (E|x-m|)^2 / sigma^2`` by the reference's four-branch
    piecewise inverse.  ``Mp >= 3/4`` has no solution; the reference keeps
    the prior ``p`` — here that branch returns NaN shape so the caller can
    detect it (there is no prior in a single-shot fit)."""
    x = jnp.asarray(x, jnp.float32).ravel()
    mean = jnp.where(zero_mean, 0.0, jnp.mean(x))
    # NOTE pyggd.py:214 only re-estimates the mean when _zeroMean is False;
    # the accumulators always subtract the CURRENT mean, which starts at the
    # requested value — single-shot equivalent: subtract the final mean.
    d = x - mean
    sigma2 = jnp.mean(d * d)
    sigma = jnp.sqrt(sigma2)
    v = jnp.mean(jnp.abs(d))
    Mp = v * v / sigma2

    # pyggd.py:222-243 piecewise inverse of Mp(p) = Gamma(2/p)^2 /
    # (Gamma(1/p) Gamma(3/p)) fitted on four ranges.
    p1 = 2.0 * jnp.log(27.0 / 16.0) / (jnp.log(3.0 / 4.0) - 2.0 * jnp.log(Mp))
    a1, a2, a3 = -0.535707356, 1.168939911, -0.1516189217
    p2 = (-a2 + jnp.sqrt(a2 * a2 - 4 * a1 * a3 + 4 * a1 * Mp)) / (2 * a1)
    b1, b2, b3 = 0.9694429, 0.8727534, 0.07350824
    vb = b1 - b2 * Mp
    p3 = (vb - jnp.sqrt(vb * vb - 4 * b3 * Mp * Mp)) / (2 * b3 * Mp)
    c1, c2, c3 = 0.3655157, 0.6723532, 0.033834
    p4 = (c2 - jnp.sqrt(c2 * c2 + 4 * c3 * jnp.log((3 - 4 * Mp) / (4 * c1)))) / (
        2 * c3
    )
    p = jnp.select(
        [Mp < 0.0131246, Mp < 0.448994, Mp < 0.671256, Mp < 0.75],
        [p1, p2, p3, p4],
        jnp.nan,
    )
    return GGDParams(sigma=sigma, p=p, mean=mean)


def fit_ggd_mle(
    x,
    p0: float = 0.7,
    sigma0: float | None = None,
    mean: float = 0.0,
    iterations: int = 50,
    alpha: float = 0.05,
    thresh: float = 1e-5,
    floor_sigma: float = 1e-7,
    floor_p: float = 0.07,
) -> GGDParams:
    """ML fit of the real GGD by the reference's alternating update
    (MLE4GGaussianD.update, pyggd.py:347-395): closed-form sigma given p,
    then one decayed gradient step ``p += dL/dp * alpha / (1 + iter)`` per
    pass over the data; stops updating after |dp| < thresh (the reference's
    ``_converge`` latch).  ``sigma0=None`` seeds sigma by moment matching."""
    x = jnp.asarray(x, jnp.float32).ravel()
    ax = jnp.abs(x - mean)
    n = x.shape[0]
    if sigma0 is None:
        sigma0 = jnp.sqrt(jnp.mean(ax * ax))

    def step(carry, it):
        sigma, p, done = carry
        # sigma given p: ( p * mean(|x|^p) )^{1/p} * sqrt(G(3/p)/G(1/p))
        acc1s = jnp.mean(jnp.exp(p * jnp.log(ax + 1e-38)))
        new_sigma = jnp.exp(
            jnp.log(p * acc1s) / p + 0.5 * _gamma_ratio_log(3.0 / p, 1.0 / p)
        )
        # p gradient (pyggd.py:366-369), using A from the CURRENT (p, sigma)
        logA = jnp.log(sigma) + 0.5 * _gamma_ratio_log(1.0 / p, 3.0 / p)
        lr = jnp.log(ax + 1e-38) - logA
        t = jnp.exp(p * lr)
        acc1p = jnp.sum(jnp.where(ax > 1e-11, t * lr, 0.0))
        acc2p = jnp.sum(t)
        dLp = (
            digamma(1.0 + 1.0 / p) + 0.5 * digamma(1.0 / p) - 1.5 * digamma(3.0 / p)
        ) / (p * p) - (
            acc1p + (digamma(1.0 / p) - 3.0 * digamma(3.0 / p)) * acc2p / (2.0 * p)
        ) / n
        new_p = p + dLp * (alpha / (1.0 + it))
        new_done = done | (jnp.abs(new_p - p) < thresh)
        sigma = jnp.where(done, sigma, jnp.maximum(new_sigma, floor_sigma))
        p = jnp.where(done, p, jnp.maximum(new_p, floor_p))
        return (sigma, p, new_done), None

    # _nItr starts at 0 and increments after each update (pyggd.py:393), so
    # pass k uses step size alpha / (1 + k) with k = 0, 1, ...
    init = (jnp.asarray(sigma0, jnp.float32), jnp.asarray(p0, jnp.float32), False)
    (sigma, p, _), _ = jax.lax.scan(
        step, init, jnp.arange(iterations, dtype=jnp.float32)
    )
    return GGDParams(sigma=sigma, p=p, mean=jnp.asarray(mean, jnp.float32))


def fit_cggd_mle(
    x,
    p0: float = 0.7,
    sa0: float | None = None,
    mean: complex = 0.0,
    iterations: int = 50,
    alpha: float = 0.05,
    thresh: float = 1e-5,
    floor_sa: float = 1e-7,
    floor_p: float = 0.07,
) -> CGGDParams:
    """ML fit of the complex GGD (MLE4CGGaussianD.update, pycggd.py:246-293):
    ``sa = (p * mean(|x|^{2p}))^{1/p} / B`` then the reference's (sample-count
    -scaled, deliberately unnormalized — pycggd.py:264 comments out the /n)
    gradient step on p with the same decay schedule and floors.  Because the
    gradient scales with the sample count, pick ``alpha`` ~ O(1/n) or the
    first step slams ``p`` into a floor (the reference shares this trait)."""
    x = jnp.asarray(x).ravel()
    x2 = jnp.abs(x - mean) ** 2
    n = x.shape[0]
    if sa0 is None:
        sa0 = jnp.mean(x2)

    def step(carry, it):
        sa, p, done = carry
        logB = _gamma_ratio_log(1.0 / p, 2.0 / p)
        acc1s = jnp.mean(jnp.exp(p * jnp.log(x2 + 1e-38)))
        new_sa = jnp.exp(jnp.log(p * acc1s) / p - logB)
        # gradient at the CURRENT (p, sa)
        larg = jnp.log(x2 + 1e-38) - logB - jnp.log(sa)
        t = jnp.exp(p * larg)
        acc1p = jnp.sum(jnp.where(jnp.sqrt(x2) > 1e-11, t * larg, 0.0))
        acc2p = jnp.sum(t)
        dLp1 = (n / (p * p)) * (p + 2.0 * digamma(1.0 / p) - 2.0 * digamma(2.0 / p))
        dLp2 = acc1p + acc2p * (digamma(1.0 / p) - 2.0 * digamma(2.0 / p)) / p
        new_p = p + (dLp1 - dLp2) * (alpha / (1.0 + it))
        new_done = done | (jnp.abs(new_p - p) < thresh)
        sa = jnp.where(done, sa, jnp.maximum(new_sa, floor_sa))
        p = jnp.where(done, p, jnp.maximum(new_p, floor_p))
        return (sa, p, new_done), None

    init = (jnp.asarray(sa0, jnp.float32), jnp.asarray(p0, jnp.float32), False)
    (sa, p, _), _ = jax.lax.scan(
        step, init, jnp.arange(iterations, dtype=jnp.float32)
    )
    return CGGDParams(sa=sa, p=p, mean=jnp.asarray(mean))


def write_ggd_param(filename: str, params, complex_form: bool = False) -> None:
    """Two-line text format of GGaussianD.writeParam (pyggd.py:115-119) /
    CGGaussianD.writeParam (pycggd.py:119-123): ``sigma p mean`` then the
    derived constants (``A lNF`` real / ``B lNF`` complex)."""
    import numpy as np

    p = float(params.p)
    if complex_form:
        scale = float(params.sa)
        B = float(np.exp(_gamma_ratio_log(1.0 / p, 2.0 / p)))
        lNF = float(np.log(np.pi) + gammaln(1.0 / p) + np.log(B))
        derived = (B, lNF)
    else:
        scale = float(params.sigma)
        A = float(scale * np.exp(0.5 * _gamma_ratio_log(1.0 / p, 3.0 / p)))
        lNF = -(float(np.log(2.0) + gammaln(1.0 + 1.0 / p)) + float(np.log(A)))
        derived = (A, lNF)
    with open(filename, "w") as fp:
        fp.write("%e %e %e\n" % (scale, p, float(abs(params.mean))))
        fp.write("%e %e\n" % derived)


def read_ggd_param(filename: str, complex_form: bool = False):
    """Read the two-line parameter file (GGaussianD.readParam,
    pyggd.py:121-149); the derived constants on line 2 are recomputed from
    (scale, p) on use, so only line 1 is consumed."""
    with open(filename) as fp:
        scale, p, mean = (float(v) for v in fp.readline().split())
    if complex_form:
        return CGGDParams(
            sa=jnp.asarray(scale, jnp.float32),
            p=jnp.asarray(p, jnp.float32),
            mean=jnp.asarray(mean),
        )
    return GGDParams(
        sigma=jnp.asarray(scale, jnp.float32),
        p=jnp.asarray(p, jnp.float32),
        mean=jnp.asarray(mean, jnp.float32),
    )
