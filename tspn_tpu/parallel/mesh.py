"""Device mesh + sharding helpers.

Replaces the reference's NCCL DDP scaffolding (mp.spawn + dist.init_
process_group + DistributedDataParallel at /root/reference/base.py:60-65
and lib/modeling/train.py:30-47) with a `jax.sharding.Mesh`: the global
batch is sharded over a `data` axis, parameters are replicated, and the
gradient all-reduce falls out of jit's partitioning instead of explicit
collectives. Works identically on a real TPU pod slice and on a CPU
mesh forced via --xla_force_host_platform_device_count (how tests and
the driver's multi-chip dry-run exercise it without hardware).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch dict onto the mesh, sharded along dim 0."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
