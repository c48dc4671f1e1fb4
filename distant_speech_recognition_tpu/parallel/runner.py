"""Multi-host utterance-batch runner.

The scale-out driver the reference never had (SURVEY.md §2.14): shard a list
of utterances across hosts (each host reads only its shard), assemble a
globally-sharded ``[B, C, T]`` batch over the (batch, freq) mesh, run the
jitted enhancement pipeline once, and write each host's outputs locally.

Single-host it degenerates to plain batch processing (tested on the virtual
8-device CPU mesh); multi-host it relies on jax.distributed having been
initialized by the launcher and uses `make_array_from_process_local_data`
so no host ever materializes the global batch.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh, snapshot_sharding

__all__ = ["run_batch", "enhance_files"]


def _pad_to(x: np.ndarray, T: int) -> np.ndarray:
    if x.shape[-1] >= T:
        return x[..., :T]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, T - x.shape[-1])]
    return np.pad(x, pad)


def run_batch(fn, x_local: np.ndarray, mesh=None):
    """Run a built pipeline over a (possibly multi-host) batch.

    ``x_local``: this process's shard ``[B_local, C, T]``.  With one process
    this is the whole batch.  Returns this process's output shard as numpy.
    """
    if mesh is None:
        mesh = make_mesh()
    sharding = batch_sharding(mesh, x_local.ndim)
    if jax.process_count() == 1:
        xg = jax.device_put(x_local, sharding)
    else:
        xg = jax.make_array_from_process_local_data(sharding, x_local)
    y = fn(xg)
    # each host pulls only its addressable shards
    shards = sorted(
        (s for s in y.addressable_shards), key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def enhance_files(
    cfg,
    mpos,
    delays,
    h,
    g,
    wav_paths,
    out_dir,
    mesh=None,
    freq_parallel: int = 1,
    noise_delays=None,
    normalize: bool = False,
):
    """End-to-end multi-utterance enhancement: read this host's shard of
    ``wav_paths``, run the sharded pipeline, write enhanced WAVs.

    Utterances are padded to the longest in the batch (static shapes); the
    batch axis is data-parallel, the beamformer stage bins shard over the
    ``freq`` axis when ``freq_parallel > 1``.  ``normalize=False`` (default)
    feeds raw int16-scale floats — the reference's SampleFeature norm=0.0
    convention that the adaptive-beamformer config defaults (energy floors,
    silence thresholds) are calibrated for.
    """
    from ..models.pipeline import build_pipeline
    from ..utils.wavio import read_wav, write_wav

    if mesh is None:
        n = len(jax.devices())
        mesh = make_mesh(batch=n // freq_parallel, freq=freq_parallel)

    # round-robin shard the file list across hosts
    pid, pn = jax.process_index(), jax.process_count()
    my_files = wav_paths[pid::pn]
    quota = -(-len(wav_paths) // pn)  # per-host rows so global shapes agree
    # the global batch (quota * pn) must divide over the mesh batch axis;
    # round the per-host quota up (zero rows beamform to silence, dropped on
    # write-out since only `my_files` rows are saved)
    nb = mesh.shape["batch"]
    per_host_mult = max(1, nb // pn) if nb % pn == 0 else nb
    quota = -(-quota // per_host_mult) * per_host_mult

    from ..runtime import native_io

    if native_io.native_available() and my_files:
        # native threaded batch loader: probe shapes from headers, then read
        # all files concurrently into the padded [quota, C, T] tensor
        infos = [native_io.wav_info_native(p) for p in my_files]
        C = infos[0][0]
        T = max(i[2] for i in infos)
        rate = infos[0][1]
        x_local = np.zeros((quota, C, T), np.float32)
        x_local[: len(my_files)] = native_io.read_wav_batch_native(
            my_files, C, T, normalize=normalize
        )
    else:
        sigs = []
        rate = 16000
        for p in my_files:
            x, rate = read_wav(p, normalize=normalize)
            sigs.append(x)
        C = sigs[0].shape[0]
        T = max(s.shape[-1] for s in sigs)
        x_local = np.zeros((quota, C, T), np.float32)
        for i, s in enumerate(sigs):
            x_local[i] = _pad_to(s, T)

    fn = build_pipeline(
        cfg, mpos, delays, h, g,
        bin_sharding=snapshot_sharding(mesh, batched=False) if freq_parallel > 1 else None,
        noise_delays=noise_delays,
    )
    with jax.set_mesh(mesh):
        y = run_batch(fn, x_local, mesh)

    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for i, p in enumerate(my_files):
        name = os.path.splitext(os.path.basename(p))[0] + "_enhanced.wav"
        outp = os.path.join(out_dir, name)
        write_wav(outp, y[i], rate, normalized=normalize)
        outs.append(outp)
    return outs
