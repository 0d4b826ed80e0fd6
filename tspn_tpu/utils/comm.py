"""Multi-process communication helpers (JAX-native).

Counterpart of /root/reference/lib/utils/comm.py, which wraps
torch.distributed + NCCL (get_world_size/get_rank/synchronize at
comm.py:13-44, pickled-object all_gather at :47-87, reduce_dict at
:90-116). Here process identity comes from the JAX runtime and the
collectives ride the same device mesh as training — no separate
communicator, no pickle-padding byte tensors.
"""

from __future__ import annotations

import pickle
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across processes (no-op single-process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("tspn_tpu.synchronize")


def all_gather(data) -> List:
    """Gather arbitrary picklable objects from every process.

    Single-process returns [data] like the reference (comm.py:55-56).
    """
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    # pad to the global max length, exchange sizes first
    size = jnp.asarray([payload.size], jnp.int32)
    sizes = np.asarray(multihost_utils.process_allgather(size)).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(padded))
    ).reshape(world, max_size)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(world)
    ]


def reduce_dict(input_dict: Dict[str, jnp.ndarray], average: bool = True) -> Dict:
    """Average (or sum) a dict of scalars across processes
    (comm.py:90-116). Values already live on replicated devices under
    pjit, so single-process is identity."""
    world = get_world_size()
    if world < 2:
        return {k: float(v) for k, v in input_dict.items()}
    from jax.experimental import multihost_utils

    keys = sorted(input_dict)
    stacked = jnp.asarray([float(input_dict[k]) for k in keys])
    total = np.asarray(multihost_utils.process_allgather(stacked)).sum(axis=0)
    if average:
        total = total / world
    return dict(zip(keys, total.tolist()))
