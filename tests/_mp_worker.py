"""Worker for the true multi-process runner test (spawned by
test_pipeline.test_multihost_runner_two_process).

Each process owns 4 virtual CPU devices and joins a 2-process jax.distributed
cluster, then runs parallel/runner.enhance_files over the shared file list —
exercising the make_array_from_process_local_data path and the per-host
round-robin file sharding (runner.py) that a single process never reaches.
"""

import os
import sys


def main():
    port, pid, nproc, wav_dir, out_dir = sys.argv[1:6]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc), jax.process_count()

    import numpy as np

    from distant_speech_recognition_tpu.design.nyquist import design_nyquist_pair
    from distant_speech_recognition_tpu.models.pipeline import PipelineConfig
    from distant_speech_recognition_tpu.ops.filterbank import FilterbankParams
    from distant_speech_recognition_tpu.parallel import enhance_files
    from distant_speech_recognition_tpu.utils import geometry

    M, m, r, C = 32, 4, 1, 2
    h, g = design_nyquist_pair(M, m, r)
    mpos = np.c_[np.arange(C) * 50.0, np.zeros((C, 2))]
    delays = geometry.calc_la_delays(mpos[:, :1], azimuth=0.5)
    cfg = PipelineConfig(
        fb=FilterbankParams(M=M, m=m, r=r, delay_compensation_type=2),
        beamformer="ds",
    )
    wavs = sorted(
        os.path.join(wav_dir, f) for f in os.listdir(wav_dir) if f.endswith(".wav")
    )
    outs = enhance_files(cfg, mpos, delays, h, g, wavs, out_dir)
    print("WORKER_OK", pid, len(outs), flush=True)


if __name__ == "__main__":
    main()
