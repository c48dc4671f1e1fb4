import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from distant_speech_recognition_tpu.ops import pallas_wpe as pw

rng = np.random.default_rng(0)
B4, C, Tf, F, P, lowerN = 64, 4, 1250, 129, 5, 2
nG = -(-F // pw.FL)
CP = C*P
W = -(-Tf//128)*128
Yr = rng.standard_normal((B4, nG, C*pw.FL, W)).astype(np.float32)
Yi = rng.standard_normal((B4, nG, C*pw.FL, W)).astype(np.float32)
G0r = (rng.standard_normal((B4, C, F, CP))*0.01).astype(np.float32)

def planes(gr):
    return pw._g_planes(jax.lax.complex(gr, jnp.zeros_like(gr)), nG)

@partial(jax.jit, static_argnums=(4, 5, 6))
def loop(Yrd, Yid, Grd, Gid, mode, has_g, reps):
    def body(i, acc):
        a = Yrd + acc * 1e-30
        o = pw._call(a, Yid, Grd, Gid, C, lowerN, P, Tf, mode, False, has_g, False)
        return acc + sum(jnp.sum(x) for x in o)
    return jax.lax.fori_loop(0, reps, body, 0.0)

Yrd, Yid, G0d = map(jax.device_put, (Yr, Yi, G0r))
gp = jax.jit(planes)(G0d)
Grd, Gid = gp

for mode, has_g in (("stats", True), ("stats", False), ("resid", True)):
    ts = {}
    for reps in (1, 9):
        float(loop(Yrd, Yid, Grd, Gid, mode, has_g, reps))
        t0=time.perf_counter()
        for _ in range(3): float(loop(Yrd, Yid, Grd, Gid, mode, has_g, reps))
        ts[reps]=(time.perf_counter()-t0)/3
    per = (ts[9]-ts[1])/8
    print("%s has_g=%s: per-call %.2f ms (%.2f us/cell)  [1x=%.1f ms 9x=%.1f ms]"%(
        mode, has_g, per*1e3, per/(B4*nG)*1e6, ts[1]*1e3, ts[9]*1e3))
