"""Complex contraction helper for the axon TPU backend.

The experimental axon TPU backend fails to lower complex ``dot_general``
when it is fused into a graph containing FFTs (UNIMPLEMENTED backend error;
established by bisection — plain complex einsum, elementwise complex math
and FFTs each work in isolation, their fusion does not).  ``ceinsum``
decomposes two-operand complex contractions into four real einsums, which
lower everywhere and let XLA use the MXU on the real parts directly.

Elementwise/outer-product einsums (no contracted index) don't hit the bug
and go through unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["ceinsum"]

# Flip to False to use native complex einsum everywhere (e.g. for debugging).
DECOMPOSE = True


def _is_complex(x) -> bool:
    return jnp.iscomplexobj(x)


def ceinsum(subscripts: str, a, b):
    """Two-operand einsum that avoids complex dot_general lowerings."""
    if not DECOMPOSE or not (_is_complex(a) or _is_complex(b)):
        return jnp.einsum(subscripts, a, b)

    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    if _is_complex(a) and _is_complex(b):
        rr = jnp.einsum(subscripts, ar, br)
        ii = jnp.einsum(subscripts, ai, bi)
        ri = jnp.einsum(subscripts, ar, bi)
        ir = jnp.einsum(subscripts, ai, br)
        return lax.complex(rr - ii, ri + ir)
    if _is_complex(a):
        return lax.complex(jnp.einsum(subscripts, ar, b), jnp.einsum(subscripts, ai, b))
    return lax.complex(jnp.einsum(subscripts, a, br), jnp.einsum(subscripts, a, bi))
