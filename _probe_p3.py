import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
W = 1280
A = rng.standard_normal((512, W)).astype(np.float32)
B = rng.standard_normal((128, W)).astype(np.float32)
NCELL = 1408

def mk(nmat, dtype):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[0]; b = b_ref[0]
        if dtype == "bf16":
            a = a.astype(jnp.bfloat16); b = b.astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        dot = partial(jax.lax.dot_general, dimension_numbers=dn,
                      preferred_element_type=jnp.float32)
        acc = jnp.zeros((512, 128), jnp.float32)
        for _ in range(nmat):
            acc = acc + dot(a, b)
        o_ref[0] = acc
    return kernel

def run(nmat, dtype):
    f = pl.pallas_call(
        mk(nmat, dtype),
        grid=(NCELL,),
        in_specs=[pl.BlockSpec((1, 512, W), lambda i: (0, 0, 0)),
                  pl.BlockSpec((1, 128, W), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, 512, 128), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 512, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    g = jax.jit(lambda a, b: jnp.sum(f(a[None], b[None])))
    Ad, Bd = jax.device_put(A), jax.device_put(B)
    v = g(Ad, Bd); float(v)
    t0=time.perf_counter()
    for _ in range(3): v = g(Ad, Bd); float(v)
    dt=(time.perf_counter()-t0)/3
    fl = NCELL*nmat*512*128*W*2
    print("nmat=%d %s: %.2f ms -> %.1f TFLOP/s (%.2f us/cell)"%(nmat, dtype, dt*1e3, fl/dt/1e12, dt/NCELL*1e6))

run(1, "f32"); run(3, "f32"); run(4, "f32"); run(3, "bf16")
