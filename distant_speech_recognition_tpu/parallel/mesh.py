"""Device mesh and sharding layout for the front-end pipeline.

The reference is single-process (SURVEY.md section 2.14: no MPI/NCCL
anywhere); scale-out is a new first-class subsystem here.  The natural axes,
proven by the reference's own per-bin independence (every beamformer loops
bins independently, beamformer.cc:1142-1152):

  - ``batch``: utterances, pure data parallelism (multi-host: one shard per
    host's data feed).
  - ``freq``: subband bins.  Beamformer weights/state for a bin live on the
    chip that owns the bin; covariance accumulation over time-sharded frames
    reduces with psum over this layout's dual (see beamforming.accumulate_sos).

Analysis/synthesis FFTs need whole-M frames, so those stages run
batch-sharded; pjit inserts the (cheap, [T,F,C]-sized) resharding collective
between the filterbank and beamformer stages over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "snapshot_sharding",
    "tm_snapshot_sharding",
    "shard_batch",
    "MESH_AXES",
]

MESH_AXES = ("batch", "freq")


def make_mesh(devices=None, batch: int | None = None, freq: int | None = None) -> Mesh:
    """Create a 2-D (batch, freq) mesh over the given (or all) devices.

    Default split: as much frequency parallelism as divides the device count
    by the requested batch parallelism; with no hints, all devices go to the
    batch axis (the always-safe data-parallel layout).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if batch is None and freq is None:
        batch, freq = n, 1
    elif batch is None:
        batch = n // freq
    elif freq is None:
        freq = n // batch
    if batch * freq != n:
        raise ValueError(f"mesh {batch}x{freq} != {n} devices")
    arr = np.asarray(devices).reshape(batch, freq)
    return Mesh(arr, MESH_AXES)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis only: [B, ...]."""
    return NamedSharding(mesh, P("batch", *([None] * (ndim - 1))))


def snapshot_sharding(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """Sharding for snapshot tensors: [B, T, F, C] (or [T, F, C]) with the
    bin axis split over ``freq`` and the batch axis over ``batch``."""
    if batched:
        return NamedSharding(mesh, P("batch", None, "freq", None))
    return NamedSharding(mesh, P(None, "freq", None))


def tm_snapshot_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for time-major snapshot tensors ``[T, B, F, C]`` (the layout
    of the flagship fused-scan pipeline, models/pipeline.py): the utterance
    axis over ``batch``, the bin axis over ``freq``.  The scan state
    (``[B, F, ...]`` pytrees) inherits the same split by propagation."""
    return NamedSharding(mesh, P(None, "batch", "freq", None))


def shard_batch(mesh: Mesh, x):
    """Place a host array batch-sharded on the mesh."""
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))


def accumulate_sos_timesharded(mesh: Mesh, X, weights, time_axis: str = "batch"):
    """`beamforming.accumulate_sos` with the FRAME axis sharded over devices,
    reduced with an explicit ``psum`` over ICI.

    This is the scale-out form of the reference's global covariance sums
    (``SubbandSOSBatchBeamformer.accu_stats_*``, pybeamformer.py:1048-1165):
    each device accumulates ``sum_t w_t X_t X_t^H`` over its local frame
    shard, then one psum of the tiny ``[F, C, C]`` sums crosses the mesh —
    frames never move, only covariances do.

    ``X``: ``[T, F, C]`` snapshots, ``weights``: ``[T]`` or ``[T, F]``;
    ``time_axis`` names the mesh axis the frame dimension is split over
    (the default reuses the data-parallel axis, which is idle during a
    single-utterance stats pass).  Returns the same ``(R [F,C,C],
    counts [F])`` as the unsharded reduction, replicated over ``time_axis``.
    """
    from ..models.beamforming import accumulate_sos

    X = np.asarray(X)
    weights = np.asarray(weights)
    # Real utterance frame counts are rarely divisible by the axis size;
    # pad with zero-weight frames (masked out of both R and counts).
    n = mesh.shape[time_axis]
    pad = (-X.shape[0]) % n
    if pad:
        X = np.concatenate([X, np.zeros((pad,) + X.shape[1:], X.dtype)])
        weights = np.concatenate(
            [weights, np.zeros((pad,) + weights.shape[1:], weights.dtype)]
        )

    def local(Xl, wl):
        R, counts = accumulate_sos(Xl, wl)
        R = jax.lax.psum(R, time_axis)
        counts = jax.lax.psum(counts, time_axis)
        return R, counts

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(time_axis), P(time_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    with jax.set_mesh(mesh):
        Xs = jax.device_put(X, NamedSharding(mesh, P(time_axis)))
        ws = jax.device_put(weights, NamedSharding(mesh, P(time_axis)))
        return fn(Xs, ws)
