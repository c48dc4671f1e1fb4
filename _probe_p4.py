import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

def run(name, ncell, W, nmat, sem="arbitrary", vary_in=False, rows=512):
    A = rng.standard_normal((ncell if vary_in else 1, rows, W)).astype(np.float32)
    B = rng.standard_normal((ncell if vary_in else 1, 128, W)).astype(np.float32)
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[0]; b = b_ref[0]
        dn = (((1,), (1,)), ((), ()))
        dot = partial(jax.lax.dot_general, dimension_numbers=dn,
                      preferred_element_type=jnp.float32)
        acc = jnp.zeros((rows, 128), jnp.float32)
        for _ in range(nmat):
            acc = acc + dot(a, b)
        o_ref[0] = acc
    im_in = (lambda i: (i, 0, 0)) if vary_in else (lambda i: (0, 0, 0))
    f = pl.pallas_call(
        kernel, grid=(ncell,),
        in_specs=[pl.BlockSpec((1, rows, W), im_in),
                  pl.BlockSpec((1, 128, W), im_in)],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )
    g = jax.jit(lambda a, b: jnp.sum(f(a, b)))
    Ad, Bd = jax.device_put(A), jax.device_put(B)
    v = g(Ad, Bd); float(v)
    t0=time.perf_counter()
    for _ in range(3): v = g(Ad, Bd); float(v)
    dt=(time.perf_counter()-t0)/3
    fl = ncell*nmat*rows*128*W*2
    print("%s: %.2f ms -> %.1f TFLOP/s (%.2f us/cell)"%(name, dt*1e3, fl/dt/1e12, dt/ncell*1e6))

run("base W=1280 n=1408 m=1", 1408, 1280, 1)
run("W=640  m=1", 1408, 640, 1)
run("W=2560 m=1", 704, 2560, 1)
run("parallel sem m=1", 1408, 1280, 1, sem="parallel")
run("vary-in m=1", 1408, 1280, 1, vary_in=True)
run("vary-in m=4", 1408, 1280, 4, vary_in=True)
run("rows=256 m=1", 1408, 1280, 1, rows=256)
