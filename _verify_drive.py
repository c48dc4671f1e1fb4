import dataclasses, glob
import numpy as np, jax
from distant_speech_recognition_tpu.models.pipeline import PipelineConfig, build_pipeline
from distant_speech_recognition_tpu.utils.prototypes import load_pair
from distant_speech_recognition_tpu.utils import geometry
from distant_speech_recognition_tpu.utils.wavio import read_wav, write_wav

files = sorted(glob.glob("/root/reference/btk20_src/unit_test/data/CMU/R1/M1005/KINECT/RAW/segmented/U1001_1M_16k_b16_c?.wav"))
assert len(files) == 4, files
chans = [read_wav(f)[0][0] for f in files]
T = min(len(c) for c in chans)
x = np.stack([c[:T] for c in chans])[None].astype(np.float32)  # [1, 4, T]
print("input:", x.shape, "rms %.1f" % float(np.sqrt((x**2).mean())))

h, g = load_pair(256, 4, 1)
mpos = np.c_[np.array([-113., 36., 76., 113.]), np.zeros((4, 2))]
delays = geometry.calc_la_delays(mpos[:, :1], azimuth=-1.306)
cfg = PipelineConfig(beamformer="gsc_rls", postfilter="zelinski",
                     aec="none", wpe=True, wpe_iterations=2)
fn = build_pipeline(cfg, mpos, delays, h, g)   # device path -> pallas WPE
y_dev = np.asarray(fn(jax.device_put(x)))[0]
write_wav("/tmp/verify_wpe_gsc.wav", y_dev, 16000)
assert np.isfinite(y_dev).all(), "NaN/Inf in device output"
print("device out rms %.1f, peak %.0f" % (float(np.sqrt((y_dev**2).mean())), float(np.abs(y_dev).max())))
