"""Device mesh construction and sharding helpers.

TPU-native replacement of the reference's process-per-GPU DDP bootstrap
(detectron2/engine/launch.py:24-84 + NCCL allreduce inside
DistributedDataParallel): one SPMD program over a ``jax.sharding.Mesh``.
The reference implements exactly one strategy — synchronous data parallelism
(SURVEY.md section 2e) — which here is a 1-D ``("data",)`` mesh with the batch
sharded on it; parameters are replicated and XLA inserts the gradient psum
over ICI.  The mesh abstraction is N-D-ready for tensor/pipeline axes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "data_sharding", "replicated", "shard_batch", "local_batch_size"]


def create_mesh(axes: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None, devices=None) -> Mesh:
    """Build a mesh over available devices.

    shape entries of -1 absorb all remaining devices (like a reshape).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = [-1] * 1 if len(axes) == 1 else None
    shape = list(shape if shape is not None else [-1] + [1] * (len(axes) - 1))
    neg = [i for i, s in enumerate(shape) if s == -1]
    assert len(neg) <= 1, "at most one -1 in mesh shape"
    if neg:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[neg[0]] = n // known
    assert int(np.prod(shape)) == n, "mesh shape {} != {} devices".format(shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def create_mesh_from_cfg(cfg) -> Mesh:
    return create_mesh(tuple(cfg.TPU.MESH_AXES), list(cfg.TPU.MESH_SHAPE))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch dict with the batch dim sharded over the mesh."""
    sharding = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def local_batch_size(global_batch: int, mesh: Optional[Mesh], axis: str = "data") -> int:
    if mesh is None:
        return global_batch
    n = mesh.shape[axis]
    assert global_batch % n == 0, "global batch {} not divisible by {} devices".format(global_batch, n)
    return global_batch // n
