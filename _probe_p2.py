import time
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

def bench(name, f, args):
    v = f(*args); float(v)
    t0=time.perf_counter()
    for _ in range(5): v = f(*args); float(v)
    dt=(time.perf_counter()-t0)/5
    print("%s: %.2f ms (%.2f us/cell)"%(name, dt*1e3, dt/(B4*nG)*1e6))

Yrd, Yid, G0d = map(jax.device_put, (Yr, Yi, G0r))
def planes(gr):
    return pw._g_planes(jax.lax.complex(gr, jnp.zeros_like(gr)), nG)
f1 = jax.jit(lambda a,b,g: sum(jnp.sum(o) for o in pw._call(a,b,*planes(g),C,lowerN,P,Tf,"stats",False,True,False)))
bench("raw stats has_g=T", f1, (Yrd, Yid, G0d))
f2 = jax.jit(lambda a,b,g: sum(jnp.sum(o) for o in pw._call(a,b,*planes(g),C,lowerN,P,Tf,"stats",False,False,False)))
bench("raw stats has_g=F", f2, (Yrd, Yid, G0d))
f3 = jax.jit(lambda a,b,g: sum(jnp.sum(o) for o in pw._call(a,b,*planes(g),C,lowerN,P,Tf,"resid",False,True,False)))
bench("raw resid", f3, (Yrd, Yid, G0d))
f4 = jax.jit(lambda a,b,g: jnp.sum(jnp.abs(pw.wpe_stats_from_planes(
    a, b, jax.lax.complex(g, jnp.zeros_like(g)), C, Tf, F, lowerN, P)[0])))
bench("stats+deint", f4, (Yrd, Yid, G0d))
