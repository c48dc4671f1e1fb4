import time
import numpy as np, jax, jax.numpy as jnp
from distant_speech_recognition_tpu.ops import pallas_wpe as pw

rng = np.random.default_rng(0)
B4, C, Tf, F, P, lowerN = 64, 4, 1250, 129, 5, 2
nG = -(-F // pw.FL)
Xr = rng.standard_normal((B4, C, Tf, F)).astype(np.float32)
Xi = rng.standard_normal((B4, C, Tf, F)).astype(np.float32)
G0 = (rng.standard_normal((B4, C, F, C*P))*0.01).astype(np.float32)

@jax.jit
def stats_sum(Xr, Xi, Gr):
    X = jax.lax.complex(Xr, Xi)
    Yr, Yi = pw._tm_planes(X, nG)
    R, r = pw.wpe_stats_from_planes(Yr, Yi, jax.lax.complex(Gr, jnp.zeros_like(Gr)),
                                    C, Tf, F, lowerN, P)
    return jnp.sum(jnp.abs(R)) + jnp.sum(jnp.abs(r))

@jax.jit
def resid_sum(Xr, Xi, Gr):
    X = jax.lax.complex(Xr, Xi)
    Yr, Yi = pw._tm_planes(X, nG)
    out = pw.wpe_resid_from_planes(Yr, Yi, jax.lax.complex(Gr, jnp.zeros_like(Gr)),
                                   C, Tf, F, lowerN, P)
    return jnp.sum(jnp.abs(out))

Xrd, Xid, Gd = map(jax.device_put, (Xr, Xi, G0))
cells = B4*nG
for name, f in (("stats", stats_sum), ("resid", resid_sum)):
    v = f(Xrd, Xid, Gd); float(v)
    t0=time.perf_counter()
    for _ in range(5): v = f(Xrd, Xid, Gd); float(v)
    dt=(time.perf_counter()-t0)/5
    print("%s: %.1f ms (%.2f us/cell, %d cells)"%(name, dt*1e3, dt/cells*1e6, cells))
