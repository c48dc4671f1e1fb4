import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from distant_speech_recognition_tpu.models import dereverberation as dr
from distant_speech_recognition_tpu.ops import pallas_wpe as pw

rng = np.random.default_rng(0)
B4, C, Tf, F, P, lowerN, upperN = 64, 4, 1250, 129, 2, 2, 6
M = 256
Yp = rng.standard_normal((Tf, B4, C, M)).astype(np.float32)

def timed(label, f, args, n=3):
    outs={}
    for reps in (1, 4):
        @jax.jit
        def looped(*a, f=f, reps=reps):
            def body(i, acc):
                return acc + f(a[0] + acc*1e-30, *a[1:])
            return jax.lax.fori_loop(0, reps, body, 0.0)
        float(looped(*args))
        t0=time.perf_counter()
        for _ in range(n): float(looped(*args))
        outs[reps]=(time.perf_counter()-t0)/n
    per=(outs[4]-outs[1])/3
    print("%-30s %7.2f ms"%(label, per*1e3))

args = (jax.device_put(Yp),)
# full packed_tm WPE
timed("wpe_multichannel_packed_tm", lambda y: jnp.sum(dr.wpe_multichannel_packed_tm(y, F, lowerN, upperN, 2)), args)
# group only (the transposes into kernel planes)
nG = -(-F // pw.FL)
W = -(-Tf // 128) * 128
def group_only(Ypx):
    t1 = jnp.moveaxis(Ypx, 0, 3)
    t1 = jnp.pad(t1, ((0,0),(0,0),(0,0),(0, W-Tf)))
    re = t1[:, :, :F, :]
    zero = jnp.zeros_like(t1[:, :, :1, :])
    im = jnp.concatenate([zero, t1[:, :, F:, :], zero], axis=2)
    def gr(x):
        x = jnp.pad(x, ((0,0),(0,0),(0, nG*pw.FL-F),(0,0)))
        x = x.reshape(B4, C, nG, pw.FL, W)
        return jnp.moveaxis(x, 2, 1).reshape(B4, nG, C*pw.FL, W)
    return jnp.sum(gr(re)) + jnp.sum(gr(im))
timed("group transposes only", group_only, args)
