"""Cosine-modulated PR filterbank prototype design.

Port of the reference's stopband-energy-minimizing design
(CosineModulatedPrototypeDesign, modulated/prototype_design.cc:36-165, built
on the Rice power-complementary lattice, modulated/pc_lattice.c): the half
prototype ``h`` (length M*m) is parameterized by J = M/2 power-complementary
lattices (guaranteeing perfect reconstruction by construction), and the
stopband energy quadratic ``h^T P h / 2`` (P from the 'sinews' integrals) is
minimized over the lattice angles.

The reference differentiates with hand-written Dpclat jacobians and GSL
conjugate gradients; here the lattice construction is written in JAX and
jax.grad supplies the exact gradient to scipy's L-BFGS.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pclat", "design_pr_prototype", "full_prototype"]


def pclat(k):
    """Power-complementary lattice -> (h0, h1), each length len(k)
    (Pclat, pc_lattice.c:32-63).  Differentiable (pure jnp when given jnp
    input)."""
    import jax.numpy as jnp

    k = jnp.asarray(k)
    k_ord = k.shape[0] - 1
    n = k_ord + 1
    h0 = [None] * n
    h1 = [None] * n
    h0[0] = k[0]
    h1[k_ord] = jnp.asarray(1.0, k.dtype)
    for idx in range(k_ord):
        if idx != k_ord:
            h1[idx] = jnp.asarray(0.0, k.dtype)
    gamma = 1.0 + k[0] * k[0]
    for i in range(1, n):
        stride = k_ord - i
        h1[stride] = h0[0]
        h0_0_new = k[i] * h0[0]
        h0[0] = h0_0_new
        for j in range(1, i):
            tmp = k[i] * h0[j] + h1[stride + j]
            h1[stride + j] = h0[j] - k[i] * h1[stride + j]
            h0[j] = tmp
        h0[i] = h1[stride + i]
        h1[stride + i] = -k[i] * h1[stride + i]
        gamma = gamma * (1.0 + k[i] * k[i])
    scale = 1.0 / jnp.sqrt(gamma)
    return jnp.stack(h0) * scale, jnp.stack(h1) * scale


def _index_map(M: int, m: int) -> np.ndarray:
    """The lattice-output -> prototype index scatter
    (prototype_design.cc:69-91).  Returns index [J, 2m]."""
    M2 = 2 * M
    Mm = m * M
    J = M // 2
    odd_m = m % 2 == 1
    index = np.zeros((J, 2 * m), np.int64)
    m_div_2 = m // 2
    for i in range(J):
        row = index[i]
        if not odd_m:
            for j in range(m_div_2):
                M2j = M2 * j
                row[j] = Mm - 1 - M2j - i
                row[m_div_2 + j] = M2j + i
                row[m + j] = Mm - 1 - M - M2j - i
                row[m + m_div_2 + j] = M + M2j + i
        else:
            for j in range(m_div_2):
                M2j = M2 * j
                row[j] = Mm - 1 - M2j - i
                row[m + m_div_2 + 1 + j] = M2 + M2j + i
                row[m + j] = Mm - 1 - M - M2j - i
                row[m_div_2 + 1 + j] = M + M2j + i
            row[m + m_div_2] = i
            row[m_div_2] = M - 1 - i
    return index


def _sinews(N: int, fs: float) -> np.ndarray:
    """Stopband integrals (prototype_design.cc:62-68): sinews[0] = pi - ws,
    sinews[i] = -sin(i ws)/i with ws = pi * fs."""
    ws = np.pi * fs
    s = np.empty(N)
    s[0] = np.pi - ws
    i = np.arange(1, N)
    s[1:] = -np.sin(i * ws) / i
    return s


def design_pr_prototype(M: int, m: int, fs: float | None = None,
                        max_iter: int = 200, seed: int = 0):
    """Design the half PR prototype h [M*m] for a (M, m) cosine-modulated
    bank; ``fs`` is the stopband edge as a fraction (default 1/(2M) as in
    tools/filterbank/design_pr_filter.py).

    Returns (h_half [M*m], stopband_energy)."""
    import jax
    import jax.numpy as jnp
    from scipy.optimize import minimize

    if fs is None:
        fs = 1.0 / (2.0 * M)
    if M % 2 == 1:
        raise NotImplementedError("odd M not supported (reference pins h[(M-1)/2])")
    N = 2 * M * m
    Mm = M * m
    J = M // 2
    index = _index_map(M, m)
    sine = jnp.asarray(_sinews(N, fs))

    def build_h(x):
        ks = x.reshape(J, m)
        outs = jax.vmap(pclat)(ks)  # (h0 [J, m], h1 [J, m])
        vals = jnp.concatenate([outs[0], outs[1]], axis=-1)  # [J, 2m]
        h = jnp.zeros(Mm, x.dtype).at[index.reshape(-1)].set(vals.reshape(-1))
        return h

    i = jnp.arange(Mm)
    abs_diff = jnp.abs(i[:, None] - i[None, :])
    plus = i[:, None] + i[None, :] + 1
    P = sine[abs_diff] + sine[plus]  # [Mm, Mm]

    def objective(x):
        h = build_h(x)
        return 0.5 * h @ (P @ h)

    obj = jax.jit(jax.value_and_grad(objective))

    rng = np.random.default_rng(seed)
    x0 = rng.standard_normal(J * m) * 0.1
    # bias toward an identity-ish lattice start (first angle dominant)
    x0[::m] += 1.0

    def fun(x):
        v, g = obj(jnp.asarray(x))
        return float(v), np.asarray(g, np.float64)

    res = minimize(fun, x0, jac=True, method="L-BFGS-B",
                   options={"maxiter": max_iter})
    h = np.asarray(build_h(jnp.asarray(res.x)))
    return h, float(res.fun)


def full_prototype(h_half: np.ndarray) -> np.ndarray:
    """Symmetric full prototype [h_half reversed, h_half] (length 2*M*m)
    per tools/filterbank/design_pr_filter.py:76-79."""
    return np.concatenate([h_half[::-1], h_half])
