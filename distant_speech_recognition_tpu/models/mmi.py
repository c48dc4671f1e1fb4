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
import numpy as np

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
    Y_target_cmp: jax.Array | None = None,
) -> jax.Array:
    """Mask target bins dominated by any interferer
    (SubbandMMI::binary_masking_, beamformer.cc:2200-2278).

    ``Y_target``: [T, F]; ``Y_interf``: [T, F, S-1].  The domination
    decision compares ``Y_target_cmp`` (defaults to ``Y_target``; pass the
    target's upper-branch output for binary_mask_type 1) against the
    interferers.  With ``avg_factor < 0`` dominated bins go to zero;
    otherwise they take ``avg_factor`` times the local frequency mean of the
    previous frame's averaged output, carried through a scan:

    - local mean per getMeanOfSubbandC (beamformer.cc:2171-2192): window
      ``[f - fwidth/2, f + fwidth/2]`` clipped to bins 1..F-1 and divided by
      the actual bin count; ``fwidth <= 1`` means no averaging at all;
    - non-dominated bins update the average as ``avg*a + y*(1-a)``
      (set_averaged_output_, beamformer.cc:2160-2168);
    - bin 0 is never masked nor does it enter the average (the reference's
      masking loop runs bins 1..M/2).
    """
    cmp = Y_target if Y_target_cmp is None else Y_target_cmp
    tgt_pow = jnp.abs(cmp) ** 2
    max_itf = jnp.max(jnp.abs(Y_interf) ** 2, axis=-1)
    dominated = (tgt_pow < max_itf).at[..., 0].set(False)

    if avg_factor < 0.0:
        return jnp.where(dominated, 0.0, Y_target)

    F = Y_target.shape[-1]
    if fwidth <= 1:
        # no spectral averaging: est reads avg[f], which this frame has not
        # yet updated — the bins are independent within the frame
        def step(avg_prev, inputs):
            y, dom = inputs
            est = avg_factor * avg_prev
            out = jnp.where(dom, est, y)
            avg_new = jnp.where(dom, est, avg_factor * avg_prev + (1 - avg_factor) * y)
            avg_new = avg_new.at[0].set(avg_prev[0])  # bin 0 untouched
            return avg_new, out
    else:
        # the reference's bin loop updates avg_output_ in place, so the
        # window mean for bin f sees THIS frame's values for bins < f and
        # last frame's for bins >= f; the window clamps to [1, F-2] (the
        # call passes fftLen/2 as the length, beamformer.cc:2257, so the
        # Nyquist bin is written but never read)
        hw = fwidth // 2
        idx = jnp.arange(F)

        def step(avg_prev, inputs):
            y, dom = inputs

            def bin_step(avg, f):
                start = jnp.maximum(f - hw, 1)
                end = jnp.minimum(f + hw, F - 2)
                w = (idx >= start) & (idx <= end)
                cnt = jnp.maximum(jnp.sum(w), 1)
                est = avg_factor * jnp.sum(jnp.where(w, avg, 0)) / cnt
                outf = jnp.where(dom[f], est, y[f])
                newf = jnp.where(
                    dom[f], est, avg_factor * avg[f] + (1 - avg_factor) * y[f]
                )
                avg = avg.at[f].set(jnp.where(f > 0, newf, avg[f]))
                return avg, outf

            avg_new, outs = jax.lax.scan(bin_step, avg_prev, jnp.arange(F))
            return avg_new, outs.at[0].set(y[0])

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
    # type 1 makes the domination decision on the upper branches (the
    # reference stores upper-branch outputs for ALL sources incl. the
    # target, calc_interference_outputs_ beamformer.cc:2060-2158) while the
    # masked/emitted signal stays the full GSC output
    Y_t_cmp = Y_cmp[..., target] if mask_with_upper_branch else None
    return mmi_binary_mask(Y_t, Y_i, avg_factor, fwidth, Y_t_cmp)
