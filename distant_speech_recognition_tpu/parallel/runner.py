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
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh, snapshot_sharding

__all__ = ["run_batch", "enhance_files", "enhance_files_pipelined"]


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


def _probe_wavs(paths, normalize):
    """Header-only probe of every file -> (loader, C, rate, T_max).

    ``loader(paths, C, T)`` returns the padded ``[len(paths), C, T]`` float
    batch, using the native threaded reader when available.
    """
    from ..runtime import native_io
    from ..utils.wavio import read_wav

    if native_io.native_available():
        infos = [native_io.wav_info_native(p) for p in paths]
        C = infos[0][0]
        rate = infos[0][1]
        T = max(i[2] for i in infos)

        def loader(chunk_paths, C, T):
            return native_io.read_wav_batch_native(chunk_paths, C, T, normalize=normalize)

        return loader, C, rate, T

    # pure-Python fallback (probes by reading headers via the wave module)
    import wave

    C = rate = None
    T = 0
    for p in paths:
        with wave.open(p, "rb") as w:
            C = C or w.getnchannels()
            rate = rate or w.getframerate()
            T = max(T, w.getnframes())

    def loader(chunk_paths, C, T):
        out = np.zeros((len(chunk_paths), C, T), np.float32)
        for i, p in enumerate(chunk_paths):
            x, _ = read_wav(p, normalize=normalize)
            out[i] = _pad_to(x, T)
        return out

    return loader, C, rate, T


def enhance_files_pipelined(
    cfg,
    mpos,
    delays,
    h,
    g,
    wav_paths,
    out_dir,
    chunk_size: int = 32,
    mesh=None,
    noise_delays=None,
    normalize: bool = False,
):
    """Pipelined single-process executor: overlap host I/O with device compute.

    Splits ``wav_paths`` into fixed-size chunks (static shapes, one compile)
    and runs a three-stage software pipeline:

        load(k+1)  [native thread-pool WAV reader]
        compute(k) [async jax dispatch — never blocks the host]
        write(k-1) [writer thread pool]

    The device is kept busy as long as the host can decode ``chunk_size``
    WAVs in one chunk's compute time; results are fetched (the only blocking
    point) one chunk behind the dispatch front.  This is the serving-side
    executor the reference never had (its drivers are strictly sequential
    read -> process -> write, SURVEY.md §4).
    """
    from ..models.pipeline import build_pipeline
    from ..utils.wavio import write_wav

    if not wav_paths:
        return []
    if mesh is None:
        mesh = make_mesh()  # all devices data-parallel
    nb = mesh.shape["batch"]
    chunk_size = max(nb, (chunk_size // nb) * nb)  # mesh-divisible

    loader, C, rate, T = _probe_wavs(wav_paths, normalize)
    fn = build_pipeline(cfg, mpos, delays, h, g, noise_delays=noise_delays)
    sharding = batch_sharding(mesh, 3)

    chunks = [wav_paths[i : i + chunk_size] for i in range(0, len(wav_paths), chunk_size)]
    os.makedirs(out_dir, exist_ok=True)

    def load_chunk(chunk_paths):
        x = loader(chunk_paths, C, T)
        if len(chunk_paths) < chunk_size:  # pad last chunk to the static shape
            pad = np.zeros((chunk_size - len(chunk_paths), C, T), np.float32)
            x = np.concatenate([x, pad], axis=0)
        return x

    def write_chunk(y, chunk_paths):
        outs = []
        for i, p in enumerate(chunk_paths):
            name = os.path.splitext(os.path.basename(p))[0] + "_enhanced.wav"
            outp = os.path.join(out_dir, name)
            write_wav(outp, y[i], rate, normalized=normalize)
            outs.append(outp)
        return outs

    outs = []
    with ThreadPoolExecutor(max_workers=1, thread_name_prefix="dsr-load") as load_pool, \
         ThreadPoolExecutor(max_workers=2, thread_name_prefix="dsr-write") as write_pool:
        next_load = load_pool.submit(load_chunk, chunks[0])
        in_flight = None  # (device result, chunk paths)
        pending_writes = []
        for k, chunk_paths in enumerate(chunks):
            x = next_load.result()
            if k + 1 < len(chunks):  # start loading the next chunk now
                next_load = load_pool.submit(load_chunk, chunks[k + 1])
            y = fn(jax.device_put(x, sharding))  # async dispatch
            if in_flight is not None:
                yk, pk = in_flight
                pending_writes.append(write_pool.submit(write_chunk, np.asarray(yk), pk))
            in_flight = (y, chunk_paths)
        yk, pk = in_flight
        pending_writes.append(write_pool.submit(write_chunk, np.asarray(yk), pk))
        for f in pending_writes:
            outs.extend(f.result())
    return outs
