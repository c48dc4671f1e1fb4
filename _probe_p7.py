import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from distant_speech_recognition_tpu.ops import pallas_wpe as pw
from distant_speech_recognition_tpu.models import dereverberation as dr

rng = np.random.default_rng(0)
B4, C, Tf, F, P, lowerN = 64, 4, 1250, 129, 5, 2
nG = -(-F // pw.FL)
CP = C*P; L = nG*pw.FL
W = -(-Tf//128)*128
Yr = rng.standard_normal((B4, nG, C*pw.FL, W)).astype(np.float32)
Yi = rng.standard_normal((B4, nG, C*pw.FL, W)).astype(np.float32)
Rr = rng.standard_normal((B4, C, CP, CP, L)).astype(np.float32)
rr = rng.standard_normal((B4, C, CP, L)).astype(np.float32)
raw = rng.standard_normal((B4, nG, 512, 128)).astype(np.float32)

def timed(label, f, args):
    outs = {}
    for reps in (1, 4):
        @partial(jax.jit, static_argnums=())
        def looped(*a, f=f, reps=reps):
            def body(i, acc):
                aa = (a[0] + acc*1e-30,) + a[1:]
                return acc + f(*aa)
            return jax.lax.fori_loop(0, reps, body, 0.0)
        float(looped(*args))
        t0=time.perf_counter()
        for _ in range(3): float(looped(*args))
        outs[reps]=(time.perf_counter()-t0)/3
    per=(outs[4]-outs[1])/3
    print("%-34s %7.2f ms"%(label, per*1e3))
    return per

args2 = tuple(map(jax.device_put, (Yr, Yi)))
# full EM (2 iters) + nothing else
timed("_wpe_em_planes 2 iters", lambda a, b: jnp.sum(jnp.abs(
    dr._wpe_em_planes(a, b, C, Tf, F, lowerN, P, 2, -20.0, 0.0, 0.0, 16000.0, False, jnp.complex64))), args2)
# stats from planes (kernel + deint, bins_minor)
timed("stats_from_planes(bins_minor)", lambda a, b: jnp.sum(jnp.abs(
    pw.wpe_stats_from_planes(a, b, jnp.zeros((B4, C, F, CP), jnp.complex64), C, Tf, F, lowerN, P, False, False, True)[0])), args2)
# gj solve alone
argsR = tuple(map(jax.device_put, (Rr, rr)))
timed("gj_solve_pallas", lambda R, r: jnp.sum(jnp.abs(
    pw.gj_solve_pallas(jax.lax.complex(R, R*0.5), jax.lax.complex(r, r*0.5)))), argsR)
# deint alone (from a raw dump)
rawd = (jax.device_put(raw),)
def deint_only(raw0):
    nrows = C*CP*pw.FL
    eyeFL = jnp.eye(pw.FL, dtype=jnp.float32)
    rrr = raw0[:, :, :nrows, :CP*pw.FL].reshape(B4, nG, C*CP, pw.FL, CP, pw.FL)
    return jnp.sum(jnp.einsum("bnrfqg,fg->bnrqf", rrr, eyeFL))
timed("deint einsum (one plane)", deint_only, rawd)
# diag load fiddling alone
eye_l = jnp.eye(CP, dtype=jnp.complex64)[..., None]
idx = jnp.arange(CP)
def loadfix(R, r):
    Rc = jax.lax.complex(R, R*0.5)
    diag = jnp.abs(Rc[..., idx, idx, :])
    max_diag = jnp.max(diag, axis=-2, keepdims=True)
    new_diag = (diag + max_diag*0.01).astype(Rc.dtype)
    Rc = Rc * (1.0 - eye_l)
    Rc = Rc.at[..., idx, idx, :].set(new_diag)
    return jnp.sum(jnp.abs(Rc))
timed("diag loading (gather+scatter)", loadfix, argsR)
