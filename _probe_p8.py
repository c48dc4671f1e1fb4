import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
B4, C, CP, L, nG, FL = 64, 4, 20, 132, 22, 6
raw = rng.standard_normal((B4, nG, 512, 128)).astype(np.float32)
Rr = rng.standard_normal((B4, C, CP, CP, L)).astype(np.float32)
rr = rng.standard_normal((B4, C, CP, L)).astype(np.float32)

def timed(label, f, args, n=5):
    vals=[]
    for trial in range(2):
        outs={}
        for reps in (1, 9):
            @jax.jit
            def looped(*a, f=f, reps=reps):
                def body(i, acc):
                    return acc + f(a[0] + acc*1e-30, *a[1:])
                return jax.lax.fori_loop(0, reps, body, 0.0)
            float(looped(*args))
            t0=time.perf_counter()
            for _ in range(n): float(looped(*args))
            outs[reps]=(time.perf_counter()-t0)/n
        vals.append((outs[9]-outs[1])/8)
    print("%-30s %7.2f / %7.2f ms"%(label, vals[0]*1e3, vals[1]*1e3))

nrows = C*CP*FL
eyeFL = jnp.eye(FL, dtype=jnp.float32)
def deint_old(raw0):
    x = raw0[:, :, :nrows, :CP*FL].reshape(B4, nG, C*CP, FL, CP, FL)
    d = jnp.einsum("bnrfqg,fg->bnrqf", x, eyeFL).reshape(B4, nG, C, CP, CP, FL)
    return jnp.sum(d.transpose(0, 2, 3, 4, 1, 5).reshape(B4, C, CP, CP, nG*FL))
def deint_new(raw0):
    x = raw0[:, :, :nrows, :CP*FL].reshape(B4, nG, C*CP, FL, CP, FL)
    d = jnp.einsum("bnrfqg,fg->brqnf", x, eyeFL)
    return jnp.sum(d.reshape(B4, C, CP, CP, nG*FL))
rawd = (jax.device_put(raw),)
timed("deint+transpose (old)", deint_old, rawd)
timed("deint direct (new)", deint_new, rawd)

eye_l = jnp.eye(CP, dtype=jnp.float32)[..., None]
idx = np.arange(CP)
def load_gather(R, r):
    Rc = jax.lax.complex(R, R*0.5)
    diag = jnp.abs(Rc[..., idx, idx, :])
    md = jnp.max(diag, axis=-2, keepdims=True)
    nd = (diag + md*0.01).astype(Rc.dtype)
    Rc = Rc * (1.0 - eye_l)
    Rc = Rc.at[..., idx, idx, :].set(nd)
    return jnp.sum(jnp.abs(Rc))
def load_mask(R, r):
    Rc = jax.lax.complex(R, R*0.5)
    eye_b = eye_l.astype(bool)
    diag = jnp.where(eye_b, jnp.abs(Rc), 0.0).sum(-2)
    md = jnp.max(diag, axis=-2, keepdims=True)
    nd = (diag + md*0.01).astype(Rc.dtype)
    Rc = jnp.where(eye_b, nd[..., :, None, :], Rc)
    return jnp.sum(jnp.abs(Rc))
argsR = tuple(map(jax.device_put, (Rr, rr)))
timed("diag loading gather (old)", load_gather, argsR)
timed("diag loading mask (new)", load_mask, argsR)
