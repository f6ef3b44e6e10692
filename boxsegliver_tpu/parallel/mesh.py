"""Mesh construction + sharding helpers (data-parallel axis "data").

See package docstring for the mapping from the reference's MirroredStrategy
(reference utils/distribution_utils.py) to JAX SPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_replicas: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh. num_replicas=0 → all visible devices
    (reference --num_gpus, distribution_utils.py:45-66)."""
    if devices is None:
        devices = jax.devices()
    n = num_replicas if num_replicas and num_replicas > 0 else len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} replicas but only {len(devices)} devices")
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def per_device_batch_size(batch_size: int, num_replicas: int) -> int:
    """Global batch must divide mesh size (reference per_device_batch_size,
    distribution_utils.py:107-134 — same error contract)."""
    remainder = batch_size % num_replicas
    if remainder:
        err = ("When running with multiple replicas, batch size must be a "
               "multiple of the number of available devices. Found {} replicas "
               "with a batch size of {}; try --batch_size={} instead."
               .format(num_replicas, batch_size, batch_size - remainder))
        raise ValueError(err)
    return batch_size // num_replicas


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (batch) of a [K, batch, ...] multi-step stack across the
    data axis (the scan axis K is unsharded)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(tree, mesh: Mesh):
    """Device-put a pytree of host batch arrays with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
