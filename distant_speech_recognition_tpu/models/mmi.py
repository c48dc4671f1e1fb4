"""Two-source MMI beamformer with binary masking between GSC outputs.

Batched reformulation of SubbandMMI (beamformer/beamformer.cc:1704-2278):
one GSC per source steered by per-source delays; the target's subband output
is suppressed whenever any interferer's beamformer output carries more
power, replaced either by zero or by an ``avg_factor``-scaled local
frequency average of the previous masked output (binary_masking_,
beamformer.cc:2096-2190).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.complex_ops import ceinsum

__all__ = ["mmi_gsc_outputs", "mmi_binary_mask", "subband_mmi"]


def mmi_gsc_outputs(X: jax.Array, wqH: jax.Array, wlH=None) -> jax.Array:
    """Per-source GSC outputs ``Y[t, f, s] = (wq_s - wl_s)^H X`` (or the
    upper branch only when wl is None; calc_gsc_output, beamformer.cc:1208).

    ``X``: [T, F, C]; ``wqH``/``wlH``: [S, F, C] conjugate weights.
    """
    w = wqH if wlH is None else wqH - wlH
    return ceinsum("sfc,tfc->tfs", w, X)


@partial(jax.jit, static_argnums=(2, 3))
def mmi_binary_mask(
    Y_target: jax.Array,
    Y_interf: jax.Array,
    avg_factor: float = -1.0,
    fwidth: int = 1,
) -> jax.Array:
    """Mask target bins dominated by any interferer
    (SubbandMMI::binary_masking_, beamformer.cc:2096-2190).

    ``Y_target``: [T, F]; ``Y_interf``: [T, F, S-1].  With ``avg_factor < 0``
    dominated bins go to zero; otherwise they take ``avg_factor`` times the
    +-fwidth local frequency mean of the previous frame's masked output
    (getMeanOfSubbandC), carried through a scan.  Bin 0 is never masked.
    """
    tgt_pow = jnp.abs(Y_target) ** 2
    max_itf = jnp.max(jnp.abs(Y_interf) ** 2, axis=-1)
    dominated = (tgt_pow < max_itf).at[..., 0].set(False)

    if avg_factor < 0.0:
        return jnp.where(dominated, 0.0, Y_target)

    F = Y_target.shape[-1]
    kernel = jnp.ones(2 * fwidth + 1) / (2 * fwidth + 1)

    def local_mean(v):
        vp = jnp.pad(v, (fwidth, fwidth), mode="edge")
        segs = [vp[i : i + F] for i in range(2 * fwidth + 1)]
        return sum(segs) / (2 * fwidth + 1)

    def step(avg_prev, inputs):
        y, dom = inputs
        est = avg_factor * local_mean(avg_prev)
        out = jnp.where(dom, est, y)
        avg_new = jnp.where(dom, est, avg_factor * y + (1 - avg_factor) * avg_prev)
        return avg_new, out

    _, out = jax.lax.scan(step, jnp.zeros(F, Y_target.dtype), (Y_target, dominated))
    return out


def subband_mmi(
    X: jax.Array,
    wqH: jax.Array,
    wlH=None,
    target: int = 0,
    avg_factor: float = -1.0,
    fwidth: int = 1,
    mask_with_upper_branch: bool = False,
) -> jax.Array:
    """Full SubbandMMI forward pass: per-source GSCs + binary masking.

    ``mask_with_upper_branch`` selects binary_mask_type 1 (compare D&S upper
    branches) vs type 0 (compare full GSC outputs; SubbandMMI::use_binary_mask,
    beamformer.cc:1716-1726).  Returns the masked target output [T, F].
    """
    Y_full = mmi_gsc_outputs(X, wqH, wlH)
    Y_cmp = mmi_gsc_outputs(X, wqH, None) if mask_with_upper_branch else Y_full
    S = wqH.shape[0]
    others = [s for s in range(S) if s != target]
    Y_t = Y_full[..., target]
    Y_i = Y_cmp[..., others]
    # type 1 compares the target's upper branch too
    if mask_with_upper_branch:
        Y_t_cmp = Y_cmp[..., target]
        tgt_pow = jnp.abs(Y_t_cmp) ** 2
        max_itf = jnp.max(jnp.abs(Y_i) ** 2, axis=-1)
        dominated = (tgt_pow < max_itf).at[..., 0].set(False)
        if avg_factor < 0.0:
            return jnp.where(dominated, 0.0, Y_t)
    return mmi_binary_mask(Y_t, Y_i, avg_factor, fwidth)
