import time, dataclasses
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from distant_speech_recognition_tpu.models.pipeline import PipelineConfig, build_pipeline
from distant_speech_recognition_tpu.utils.prototypes import load_pair
from distant_speech_recognition_tpu.utils import geometry

M, m, r = 256, 4, 1
C, fs, secs = 4, 16000, 10.0
T = int(fs*secs)
h, g = load_pair(M, m, r)
mpos = np.c_[np.array([-113., 36., 76., 113.]), np.zeros((4, 2))]
delays = geometry.calc_la_delays(mpos[:, :1], azimuth=-1.306)
rng = np.random.default_rng(0)
B = 64
x = (rng.standard_normal((B, C, T))*1500).astype(np.float32)
p = (rng.standard_normal((B, T))*1500).astype(np.float32)
xd, pd = jax.device_put(x), jax.device_put(p)

base = PipelineConfig(beamformer="gsc_rls", postfilter="zelinski")

def timed(label, mkfn, needs_play):
    fns = {}
    for reps in (1, 4):
        fn = mkfn()
        @jax.jit
        def looped(x, p, fn=fn, reps=reps):
            def body(i, acc):
                xx = x + acc*1e-30
                y = fn(xx, p) if needs_play else fn(xx)
                return acc + jnp.sum(y[:, ::1000])
            return jax.lax.fori_loop(0, reps, body, 0.0)
        float(looped(xd, pd))
        t0=time.perf_counter()
        for _ in range(3): float(looped(xd, pd))
        fns[reps]=(time.perf_counter()-t0)/3
    per=(fns[4]-fns[1])/3
    print("%-28s per-call %7.2f ms  (%.0f audio-s/s at B=%d)"%(label, per*1e3, B*secs/per, B))
    return per

t_gsc  = timed("gsc_rls+zelinski only", lambda: build_pipeline(base, mpos, delays, h, g), False)
t_aec  = timed("+nlms aec", lambda: build_pipeline(dataclasses.replace(base, aec="nlms"), mpos, delays, h, g), True)
t_wpe  = timed("+wpe (no aec)", lambda: build_pipeline(dataclasses.replace(base, wpe=True, wpe_iterations=2), mpos, delays, h, g), False)
t_full = timed("full config4", lambda: build_pipeline(dataclasses.replace(base, aec="nlms", wpe=True, wpe_iterations=2), mpos, delays, h, g), True)
print("increments: aec %.1f ms, wpe %.1f ms"%( (t_aec-t_gsc)*1e3, (t_wpe-t_gsc)*1e3))
