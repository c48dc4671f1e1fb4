"""Acoustic echo cancellation in the subband domain.

Batched reformulation of the reference's AEC family (aec/aec.cc): NLMS,
scalar Kalman, block (multi-tap) Kalman, double-talk-detecting block Kalman,
and the information filter.  Every canceller is a `lax.scan` over frames
carrying per-bin state ``[F, ...]``; all bins update in parallel.

Conventions (per bin k, frame t):
  error     E = A - R . V        (unconjugated dot for tap vectors, zdotu)
  gating    update only when |V_0|^2 > threshold   (update_, aec.cc:34-39)
  mirror    bins 0..M/2 computed, rest conjugated by the caller

``V``/``A``: played-back and recorded (mic) subband signals ``[T, F]``
(half band).  Tap vectors stack the current + past played frames, newest
first (ComplexBuffer_, aec.h:117-191).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..ops.complex_ops import ceinsum

__all__ = [
    "nlms_aec",
    "kalman_aec",
    "block_kalman_aec",
    "dtd_block_kalman_aec",
    "information_filter_aec",
    "sqrt_information_filter_aec",
    "play_taps",
]


def play_taps(V: jax.Array, sampleN: int, amp4play: float = 1.0) -> jax.Array:
    """Stack the played signal into tap vectors, newest first:
    ``taps[t, ..., n] = amp * V[t - n, ...]`` (zero history).  Time is the
    LEADING axis (scan order), any trailing dims ride along."""
    T = V.shape[0]
    pad = [(sampleN - 1, 0)] + [(0, 0)] * (V.ndim - 1)
    Vp = jnp.pad(V, pad) * amp4play
    slices = [
        jax.lax.slice_in_dim(Vp, sampleN - 1 - n, sampleN - 1 - n + T, axis=0)
        for n in range(sampleN)
    ]
    return jnp.stack(slices, axis=-1)


def _aec_state_shape(V, A):
    """Broadcast per-frame state shape from ``V [T, *Sv]`` / ``A [T, *Sa]``.

    The scans are elementwise per bin, so they generalize to any broadcast-
    compatible leading dims — the time-major batched pipeline passes
    ``V [T, B, 1, F]`` against ``A [T, B, C, F]`` (one far-end reference
    cancelling every channel, like the reference's per-channel feature
    sharing one played stream)."""
    import numpy as _np

    return tuple(_np.broadcast_shapes(V.shape[1:], A.shape[1:]))


@partial(jax.jit, static_argnums=())
def nlms_aec(
    V: jax.Array,
    A: jax.Array,
    delta: float = 100.0,
    epsilon: float = 1.0e-4,
    threshold: float = 100.0,
):
    """NLMS echo canceller (NLMSAcousticEchoCancellationFeature,
    aec.cc:41-81)::

        E = A - R V
        R <- R - eps |V|^2/(delta + |A|^2) (R - A/V)   if |V|^2 > threshold

    ``V``/``A``: ``[T, *S]`` with broadcastable ``*S`` (classically
    ``[T, F]``).  Returns ``(E [T, *S], R_final [*S])``.
    """
    shape = _aec_state_shape(V, A)

    def step(R, inputs):
        Vk, Ak = inputs
        Ek = Ak - R * Vk
        gate = jnp.abs(Vk) ** 2 > threshold
        Gkhat = Ak / jnp.where(jnp.abs(Vk) > 0, Vk, 1.0)
        dC = R - Gkhat
        deltaC = dC * (epsilon * jnp.abs(Vk) ** 2 / (delta + jnp.abs(Ak) ** 2))
        R_new = jnp.where(gate, R - deltaC, R)
        return R_new, Ek

    R0 = jnp.zeros(shape, V.dtype)
    R, E = jax.lax.scan(step, R0, (V, A))
    return E, R


@partial(jax.jit, static_argnums=())
def kalman_aec(
    V: jax.Array,
    A: jax.Array,
    beta: float = 0.95,
    sigma2: float = 10.0e-4,
    threshold: float = 100.0,
):
    """Scalar Kalman echo canceller per bin
    (KalmanFilterEchoCancellationFeature, aec.cc:118-164).

    ``V``/``A``: ``[T, *S]`` broadcastable (see `_aec_state_shape`).
    Returns ``(E [T, *S], R_final [*S])``.
    """
    shape = _aec_state_shape(V, A)

    class S(NamedTuple):
        R: jax.Array
        sigma2_v: jax.Array
        K_k: jax.Array

    def step(s, inputs):
        Vk, Ak = inputs
        Ek = Ak - s.R * Vk
        gate = jnp.abs(Vk) ** 2 > threshold

        sigma2_v = beta * s.sigma2_v + (1.0 - beta) * jnp.abs(Ek) ** 2
        K_k_k1 = s.K_k + sigma2
        sigma2_s = jnp.abs(Vk) ** 2 * K_k_k1 + sigma2_v
        Gk = jnp.conj(Vk) * (K_k_k1 / sigma2_s)
        R_new = s.R + Gk * Ek
        K_new = (1.0 - K_k_k1 * jnp.abs(Vk) ** 2 / sigma2_s) * K_k_k1

        s_new = S(
            R=jnp.where(gate, R_new, s.R),
            sigma2_v=jnp.where(gate, sigma2_v, s.sigma2_v),
            K_k=jnp.where(gate, K_new, s.K_k),
        )
        return s_new, Ek

    s0 = S(
        R=jnp.zeros(shape, V.dtype),
        sigma2_v=jnp.full(shape, sigma2, jnp.float32),
        K_k=jnp.full(shape, sigma2, jnp.float32),
    )
    s, E = jax.lax.scan(step, s0, (V, A))
    return E, s.R


@partial(jax.jit, static_argnums=(2,))
def block_kalman_aec(
    V: jax.Array,
    A: jax.Array,
    sampleN: int = 1,
    beta: float = 0.95,
    sigmau2: float = 10.0e-4,
    sigmak2: float = 5.0,
    threshold: float = 100.0,
    amp4play: float = 1.0,
):
    """Multi-tap Kalman echo canceller
    (BlockKalmanFilterEchoCancellationFeature, aec.cc:244-308)::

        E  = A - R . V          (zdotu: unconjugated)
        Kp = K + Sigma_u
        G  = Kp conj(V) / (V . Kp conj(V) + sigma_v)
        R += E G;   K = (I - G V^T) Kp

    ``V``/``A``: ``[T, *S]`` broadcastable (see `_aec_state_shape`).
    Returns ``(E [T, *S], R_final [*S, N])``.
    """
    N = sampleN
    shape = _aec_state_shape(V, A)
    taps = play_taps(V, N, amp4play)  # [T, *Sv, N]
    eye = jnp.eye(N, dtype=V.dtype)

    class S(NamedTuple):
        R: jax.Array  # [*S, N]
        sigma2_v: jax.Array  # [*S]
        K_k: jax.Array  # [*S, N, N]

    def step(s, inputs):
        Vk, Ak = inputs  # [*Sv, N], [*Sa]
        Ek = Ak - ceinsum("...n,...n->...", s.R, Vk)
        gate = jnp.broadcast_to(jnp.abs(Vk[..., 0]) ** 2 > threshold, Ek.shape)

        sigma2_v = beta * s.sigma2_v + (1.0 - beta) * jnp.abs(Ek) ** 2
        K_k_k1 = s.K_k + sigmau2 * eye
        scr = ceinsum("...nm,...m->...n", K_k_k1, jnp.conj(Vk))
        sigma2_s = jnp.real(ceinsum("...n,...n->...", Vk, scr)) + sigma2_v
        Gk = scr / sigma2_s[..., None]
        R_new = s.R + Ek[..., None] * Gk
        IGV = eye - Gk[..., :, None] * Vk[..., None, :]
        K_new = ceinsum("...nm,...ml->...nl", IGV, K_k_k1)

        s_new = S(
            R=jnp.where(gate[..., None], R_new, s.R),
            sigma2_v=jnp.where(gate, sigma2_v, s.sigma2_v),
            K_k=jnp.where(gate[..., None, None], K_new, s.K_k),
        )
        return s_new, Ek

    s0 = S(
        R=jnp.zeros(shape + (N,), V.dtype),
        sigma2_v=jnp.full(shape, sigmau2, jnp.float32),
        K_k=jnp.broadcast_to(sigmak2 * jnp.eye(N, dtype=V.dtype), shape + (N, N)),
    )
    s, E = jax.lax.scan(step, s0, (taps, A))
    return E, s.R


def _dtd_scale_factors(A, E, frame_no, snr0, Ek0, Sk0, smooth, snr_th, eng_th):
    """Sequential-over-bins double-talk scale factors
    (DTDBlockKalmanFilterEchoCancellationFeature::update_band_,
    aec.cc:818-850).  The smoothed SNR state is a *scalar shared across
    bins*, updated bin by bin within the frame — replicated with a scan
    over bins.  Returns (sf [F], new scalar states)."""
    smth = jnp.where(frame_no < 100, 1.0 - frame_no * (1.0 - smooth) / 100.0, smooth)

    def bin_step(carry, inputs):
        snr, EkE, SkE = carry
        Ak, Ek = inputs
        Sk = Ak - Ek
        currEk = jnp.abs(Ek) ** 2
        currSk = jnp.abs(Sk) ** 2
        EkE = currEk * smth + EkE * (1.0 - smth)
        SkE = currSk * smth + SkE * (1.0 - smth)
        snr = (currSk / (currEk + 1e-15)) * smth + snr * (1.0 - smth)
        ok = (frame_no < 100) | ((snr > snr_th) & (SkE > eng_th))
        sf = jnp.where(ok, 2.0 / (1.0 + jnp.exp(-snr)) - 1.0, -1.0)
        return (snr, EkE, SkE), sf

    (snr, EkE, SkE), sf = jax.lax.scan(bin_step, (snr0, Ek0, Sk0), (A, E))
    return sf, snr, EkE, SkE


@partial(jax.jit, static_argnums=(2,))
def dtd_block_kalman_aec(
    V: jax.Array,
    A: jax.Array,
    sampleN: int = 1,
    beta: float = 0.95,
    sigmau2: float = 10.0e-4,
    sigmak2: float = 5.0,
    snr_th: float = 2.0,
    eng_th: float = 100.0,
    smooth: float = 0.9,
    amp4play: float = 1.0,
):
    """Block Kalman with double-talk detection
    (DTDBlockKalmanFilterEchoCancellationFeature, aec.cc:862-960): the
    prediction covariance is scaled by a smoothed-SNR sigmoid ``sf`` and the
    update is skipped entirely when double-talk is detected (sf < 0)."""
    F = V.shape[-1]
    N = sampleN
    taps = play_taps(V, N, amp4play)
    eye = jnp.eye(N, dtype=V.dtype)

    class S(NamedTuple):
        R: jax.Array
        sigma2_v: jax.Array
        K_k: jax.Array
        snr: jax.Array  # scalar
        EkE: jax.Array  # scalar
        SkE: jax.Array  # scalar
        frame: jax.Array  # scalar int

    def step(s, inputs):
        Vk, Ak = inputs
        Ek = Ak - ceinsum("fn,fn->f", s.R, Vk)
        sf, snr, EkE, SkE = _dtd_scale_factors(
            Ak, Ek, s.frame, s.snr, s.EkE, s.SkE, smooth, snr_th, eng_th
        )
        gate = sf >= 0.0

        sigma2_v = beta * s.sigma2_v + (1.0 - beta) * jnp.abs(Ek) ** 2
        K_k_k1 = s.K_k * 1.0 + (sf[:, None, None] * sigmau2) * eye  # Sigma_u scaled by sf
        scr = ceinsum("fnm,fm->fn", K_k_k1, jnp.conj(Vk))
        sigma2_s = jnp.real(ceinsum("fn,fn->f", Vk, scr)) + sigma2_v
        Gk = scr / sigma2_s[:, None]
        R_new = s.R + Ek[:, None] * Gk
        IGV = eye - Gk[:, :, None] * Vk[:, None, :]
        K_new = ceinsum("fnm,fml->fnl", IGV, K_k_k1)

        s_new = S(
            R=jnp.where(gate[:, None], R_new, s.R),
            sigma2_v=jnp.where(gate, sigma2_v, s.sigma2_v),
            K_k=jnp.where(gate[:, None, None], K_new, s.K_k),
            snr=snr,
            EkE=EkE,
            SkE=SkE,
            frame=s.frame + 1,
        )
        return s_new, Ek

    s0 = S(
        R=jnp.zeros((F, N), V.dtype),
        sigma2_v=jnp.full((F,), sigmau2, jnp.float32),
        K_k=jnp.broadcast_to(sigmak2 * jnp.eye(N, dtype=V.dtype), (F, N, N)),
        snr=jnp.asarray(0.0, jnp.float32),
        EkE=jnp.asarray(0.0, jnp.float32),
        SkE=jnp.asarray(0.0, jnp.float32),
        frame=jnp.asarray(0, jnp.int32),
    )
    s, E = jax.lax.scan(step, s0, (taps, A))
    return E, s.R


@partial(jax.jit, static_argnums=(2,))
def information_filter_aec(
    V: jax.Array,
    A: jax.Array,
    sampleN: int = 1,
    beta: float = 0.95,
    sigmau2: float = 10.0e-4,
    sigmak2: float = 5.0,
    snr_th: float = 2.0,
    eng_th: float = 100.0,
    smooth: float = 0.9,
    loading: float = 1.0e-4,
    amp4play: float = 1.0,
    floor_val: float = 0.01,
):
    """Information-form echo canceller
    (InformationFilterEchoCancellationFeature, aec.cc:435-518): SNR-gated
    per-bin updates with per-bin smoothed statistics, eigendecomposition
    inverse, and extra diagonal loading on the information matrix.

    Deviation noted: the reference keeps a single global ``skippedN_``
    counter resetting the current bin's filter after 30 skips across all
    bins/frames; here the counter is per bin, which resets a bin's filter
    after 30 of *its own* skips (the global counter's cross-bin coupling is
    an artifact of the serial loop, not the algorithm).
    """
    F = V.shape[-1]
    N = sampleN
    taps = play_taps(V, N, amp4play)
    eye = jnp.eye(N, dtype=V.dtype)
    R_init = jnp.zeros((F, N), V.dtype).at[:, 0].set(1.0)

    def _inv_h(M):
        w, v = jnp.linalg.eigh(M)
        inv_w = (1.0 / w).astype(v.dtype)
        return jnp.einsum("...ij,...j,...kj->...ik", v, inv_w, jnp.conj(v))

    class S(NamedTuple):
        R: jax.Array
        sigma2_v: jax.Array
        K_k: jax.Array
        snr: jax.Array  # [F]
        EkE: jax.Array  # [F]
        SkE: jax.Array  # [F]
        skipped: jax.Array  # [F] int
        frame: jax.Array

    def step(s, inputs):
        Vk, Ak = inputs
        Ek = Ak - ceinsum("fn,fn->f", s.R, Vk)
        absEk = jnp.abs(Ek)
        # [sic] residuals below the floor are normalized to UNIT magnitude,
        # not to floor_val — the reference's literal code (aec.cc:455-457)
        Ek = jnp.where(absEk < floor_val, Ek / jnp.where(absEk > 0, absEk, 1.0), Ek)

        # per-bin SNR stats (update_band_, aec.cc:371-399)
        smth = jnp.where(s.frame < 100, 1.0 - s.frame * (1.0 - smooth) / 100.0, smooth)
        Sk = Ak - Ek
        currEk = jnp.abs(Ek) ** 2
        currSk = jnp.abs(Sk) ** 2
        EkE = currEk * smth + s.EkE * (1.0 - smth)
        SkE = currSk * smth + s.SkE * (1.0 - smth)
        snr = (currSk / (currEk + 1e-15)) * smth + s.snr * (1.0 - smth)
        sf_ok = (s.frame < 100) | ((snr > snr_th) & (SkE > eng_th))
        gate = (jnp.abs(Vk[..., 0]) ** 2 > eng_th) & sf_ok

        # skip bookkeeping + filter reset after too many skips
        skipped = jnp.where(gate, s.skipped, s.skipped + 1)
        reset = (~gate) & (s.skipped >= 30)
        R_base = jnp.where(reset[:, None], R_init, s.R)
        skipped = jnp.where(reset, 1, skipped)

        sigma2_v = beta * s.sigma2_v + (1.0 - beta) * jnp.abs(Ek) ** 2
        K_k_k1 = s.K_k + sigmau2 * eye
        Y_pred = _inv_h(K_k_k1)  # information matrix
        y_pred = ceinsum("fnm,fm->fn", Y_pred, R_base)
        scale = (1.0 / sigma2_v)[:, None]
        i_k = jnp.conj(Vk) * scale * Ak[:, None]
        I_k = ceinsum("fn,fm->fnm", jnp.conj(Vk) * scale, Vk)
        Y_new = I_k + Y_pred + loading * eye
        K_new = _inv_h(Y_new)
        R_new = ceinsum("fnm,fm->fn", K_new, y_pred + i_k)

        s_new = S(
            R=jnp.where(gate[:, None], R_new, R_base),
            sigma2_v=jnp.where(gate, sigma2_v, s.sigma2_v),
            K_k=jnp.where(gate[:, None, None], K_new, s.K_k),
            snr=snr,
            EkE=EkE,
            SkE=SkE,
            skipped=skipped,
            frame=s.frame + 1,
        )
        return s_new, Ek

    s0 = S(
        R=R_init,
        sigma2_v=jnp.full((F,), sigmau2, jnp.float32),
        K_k=jnp.broadcast_to(sigmak2 * jnp.eye(N, dtype=V.dtype), (F, N, N)),
        snr=jnp.zeros((F,), jnp.float32),
        EkE=jnp.zeros((F,), jnp.float32),
        SkE=jnp.zeros((F,), jnp.float32),
        skipped=jnp.zeros((F,), jnp.int32),
        frame=jnp.asarray(0, jnp.int32),
    )
    s, E = jax.lax.scan(step, s0, (taps, A))
    return E, s.R


@partial(jax.jit, static_argnums=(2,))
def sqrt_information_filter_aec(
    V: jax.Array,
    A: jax.Array,
    sampleN: int = 1,
    beta: float = 0.95,
    sigmau2: float = 10.0e-4,
    snr_th: float = 2.0,
    eng_th: float = 100.0,
    smooth: float = 0.9,
    loading: float = 1.0e-4,
    amp4play: float = 1.0,
    floor_val: float = 0.01,
):
    """Square-root information-filter echo canceller
    (SquareRootInformationFilterEchoCancellationFeature, aec.cc:615-790).

    Propagates the inverse Cholesky factor of the state covariance and the
    information state through temporal/observational updates.  The reference
    triangularizes pre-arrays with complex Givens sweeps; here each update is
    one batched QR per bin (identical factors up to unitary phases —
    see ops/sqrt_kernels.py).  SNR gating and the |E| floor follow the
    reference; the global skip counter is per-bin as in
    `information_filter_aec`.
    """
    from ..ops.sqrt_kernels import propagate_information_sqrt

    F = V.shape[-1]
    N = sampleN
    taps = play_taps(V, N, amp4play)
    R_init = jnp.zeros((F, N), V.dtype).at[:, 0].set(1.0)
    # inverse Cholesky factor of K (upper triangular info square root)
    S_init = jnp.broadcast_to(
        (1.0 / jnp.sqrt(sigmau2)) * jnp.eye(N, dtype=V.dtype), (F, N, N)
    )
    Qs_inv = (1.0 / jnp.sqrt(sigmau2)) * jnp.eye(N, dtype=V.dtype)

    class S(NamedTuple):
        R: jax.Array  # filter coefficients [F, N]
        Sinfo: jax.Array  # info square root [F, N, N]
        sigma2_v: jax.Array
        snr: jax.Array
        EkE: jax.Array
        SkE: jax.Array
        skipped: jax.Array
        frame: jax.Array

    def step(s, inputs):
        Vk, Ak = inputs
        Ek = Ak - ceinsum("fn,fn->f", s.R, Vk)
        absEk = jnp.abs(Ek)
        # [sic] residuals below the floor are normalized to UNIT magnitude,
        # not to floor_val — the reference's literal code (aec.cc:455-457)
        Ek = jnp.where(absEk < floor_val, Ek / jnp.where(absEk > 0, absEk, 1.0), Ek)

        smth = jnp.where(s.frame < 100, 1.0 - s.frame * (1.0 - smooth) / 100.0, smooth)
        Sk = Ak - Ek
        currEk = jnp.abs(Ek) ** 2
        currSk = jnp.abs(Sk) ** 2
        EkE = currEk * smth + s.EkE * (1.0 - smth)
        SkE = currSk * smth + s.SkE * (1.0 - smth)
        snr = (currSk / (currEk + 1e-15)) * smth + s.snr * (1.0 - smth)
        sf_ok = (s.frame < 100) | ((snr > snr_th) & (SkE > eng_th))
        gate = (jnp.abs(Vk[..., 0]) ** 2 > eng_th) & sf_ok

        skipped = jnp.where(gate, s.skipped, s.skipped + 1)
        reset = (~gate) & (s.skipped >= 30)
        R_base = jnp.where(reset[:, None], R_init, s.R)
        skipped = jnp.where(reset, 1, skipped)

        sigma2_v = beta * s.sigma2_v + (1.0 - beta) * jnp.abs(Ek) ** 2

        # Temporal update: info matrix of (K + Sigma_u) from the pre-array
        # [[Qs_inv, -Sinfo],[0, Sinfo]] — equivalently combine covariances:
        # Y_pred^{-1} = K + Sigma_u.  In square-root form: S_pred is the info
        # factor of inv(inv(Y) + Sigma_u); realized with two QRs.
        K_sqrt = jnp.linalg.inv(s.Sinfo)  # covariance sqrt (N<=4: cheap)
        from ..ops.sqrt_kernels import propagate_covariance_sqrt

        Kp_sqrt = propagate_covariance_sqrt(
            jnp.swapaxes(jnp.conj(K_sqrt), -1, -2),
            jnp.eye(N, dtype=V.dtype),
            jnp.sqrt(sigmau2) * jnp.eye(N, dtype=V.dtype),
        )
        S_pred = jnp.linalg.inv(Kp_sqrt)

        # Observational update + sqrt loading: stack the scaled regressor row
        # and the sqrt(loading) identity into the QR.
        rinv = (1.0 / jnp.sqrt(sigma2_v))[:, None]
        S_obs = propagate_information_sqrt(S_pred, jnp.conj(Vk)[:, None, :] * rinv[..., None], jnp.ones((F, 1)))
        S_new = propagate_information_sqrt(
            S_obs, jnp.broadcast_to(jnp.sqrt(loading) * jnp.eye(N, dtype=V.dtype), (F, N, N)),
            jnp.ones((F, N)),
        )

        # information state and coefficient extraction
        Y_pred = ceinsum("fin,fim->fnm", jnp.conj(S_pred), S_pred)
        y_pred = ceinsum("fnm,fm->fn", Y_pred, R_base)
        i_k = jnp.conj(Vk) * (rinv**2) * Ak[:, None]
        Y_new = ceinsum("fin,fim->fnm", jnp.conj(S_new), S_new)
        R_new = jnp.linalg.solve(Y_new, (y_pred + i_k)[..., None])[..., 0]

        s_new = S(
            R=jnp.where(gate[:, None], R_new, R_base),
            Sinfo=jnp.where(gate[:, None, None], S_new, s.Sinfo),
            sigma2_v=jnp.where(gate, sigma2_v, s.sigma2_v),
            snr=snr,
            EkE=EkE,
            SkE=SkE,
            skipped=skipped,
            frame=s.frame + 1,
        )
        return s_new, Ek

    s0 = S(
        R=R_init,
        Sinfo=S_init,
        sigma2_v=jnp.full((F,), sigmau2, jnp.float32),
        snr=jnp.zeros((F,), jnp.float32),
        EkE=jnp.zeros((F,), jnp.float32),
        SkE=jnp.zeros((F,), jnp.float32),
        skipped=jnp.zeros((F,), jnp.int32),
        frame=jnp.asarray(0, jnp.int32),
    )
    s, E = jax.lax.scan(step, s0, (taps, A))
    return E, s.R
