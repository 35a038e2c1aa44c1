"""Device mesh + sharding helpers: data parallelism over ICI.

The reference is strictly single-GPU (SURVEY.md §2.3: no NCCL/MPI/tf.distribute
anywhere; CUDA_VISIBLE_DEVICES selection at train_ShapeNet.py:41-42). The TPU
framework supplies data parallelism as a first-class component:

- a 1-D ``jax.sharding.Mesh`` over all local devices with axis ``"data"``;
- batches sharded over the batch axis (``P("data")``), params/state replicated;
- gradient all-reduce and cross-replica batch-norm moments fall out of XLA's
  partitioner: the loss / BN reductions span the sharded batch axis, so the
  compiler inserts the ``psum``s over ICI itself (the scaling-book recipe —
  annotate shardings, let XLA place collectives).

Siamese pairs are interleaved along the batch axis; batch shards therefore
keep each (sample, augmented-sample) pair on one device as long as the
per-device batch is even — asserted in ``shard_batch``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


@functools.lru_cache(maxsize=None)
def cached_mesh(n_devices: Optional[int] = None) -> Mesh:
    """``make_mesh`` over the process's local devices, built once per size.

    For hot per-call paths (e.g. the sharded label-propagation solver looping
    over S3DIS rooms) where rebuilding the Mesh every invocation is pure
    overhead. The local device list is fixed for the life of the process, so
    caching on ``n_devices`` alone is sound.
    """
    return make_mesh(n_devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, *, pair_interleaved: bool = False) -> Any:
    """Device-put a pytree of [B, ...] arrays sharded over the batch axis.

    Args:
      pair_interleaved: set for Full-style Siamese batches ([2B] with pairs at
        even/odd positions) — checks pairs don't straddle a device boundary,
        which would break the in-step pair difference.
    """
    n = mesh.devices.size
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n != 0:
            return jax.device_put(x, replicated_sharding(mesh))
        if pair_interleaved and (x.shape[0] // n) % 2 != 0:
            raise ValueError(
                f"per-device batch {x.shape[0]}/{n} must be even to keep "
                "Siamese pairs device-local"
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
