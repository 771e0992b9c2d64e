"""Cross-process communication primitives.

The reference (detectron2/utils/comm.py:139-263) uses a gloo side-channel to
gather pickled Python objects between ranks.  On TPU we have one JAX *process*
per host; device-level collectives live inside jitted steps (psum over the
mesh), and the rare host-level object gathers here go through
``jax.experimental.multihost_utils`` when multiple processes exist and
degenerate to no-ops in the common single-process case.
"""

from __future__ import annotations

import functools
import pickle
from typing import Any, List

import numpy as np

__all__ = [
    "get_world_size",
    "get_rank",
    "get_local_rank",
    "get_local_size",
    "is_main_process",
    "synchronize",
    "all_gather",
    "gather",
    "shared_random_seed",
    "reduce_dict",
]


def _jax():
    import jax

    return jax


def get_world_size() -> int:
    return _jax().process_count()


def get_rank() -> int:
    return _jax().process_index()


def get_local_rank() -> int:
    # single-process-per-host model: local rank is always 0
    return 0


def get_local_size() -> int:
    return 1


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize():
    """Barrier across processes (no-op single-process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("fsgd_tpu.comm.synchronize")


def _allgather_bytes(data: bytes) -> List[bytes]:
    """All-gather arbitrary pickled bytes across processes via padded uint8 arrays."""
    import jax
    from jax.experimental import multihost_utils

    arr = np.frombuffer(data, dtype=np.uint8)
    local_len = np.array([arr.size], dtype=np.int64)
    all_lens = multihost_utils.process_allgather(local_len).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros((max_len,), dtype=np.uint8)
    padded[: arr.size] = arr
    gathered = multihost_utils.process_allgather(padded)  # (world, max_len)
    return [bytes(gathered[i, : int(all_lens[i])].tobytes()) for i in range(jax.process_count())]


def all_gather(data: Any, group=None) -> List[Any]:
    """Gather arbitrary picklable data from all processes; returns a list."""
    if get_world_size() == 1:
        return [data]
    blobs = _allgather_bytes(pickle.dumps(data))
    return [pickle.loads(b) for b in blobs]


def gather(data: Any, dst: int = 0, group=None) -> List[Any]:
    """Gather data to the dst process; other processes get []."""
    if get_world_size() == 1:
        return [data]
    everyone = all_gather(data)  # allgather is the natural TPU collective
    return everyone if get_rank() == dst else []


def shared_random_seed() -> int:
    """A random seed shared by all processes (reference comm.py:220-232)."""
    ints = np.random.randint(2 ** 31)
    all_ints = all_gather(ints)
    return int(all_ints[0])


def reduce_dict(input_dict, average=True):
    """Average (or sum) scalar values in a dict across processes."""
    world_size = get_world_size()
    if world_size < 2:
        return input_dict
    keys = sorted(input_dict.keys())
    values = np.array([float(input_dict[k]) for k in keys], dtype=np.float64)
    gathered = np.stack(all_gather(values))
    reduced = gathered.mean(0) if average else gathered.sum(0)
    return {k: reduced[i] for i, k in enumerate(keys)}
