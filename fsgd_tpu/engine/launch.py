"""Multi-device launch.

Parity with detectron2/engine/launch.py:24-84 — but where the reference
spawns one process per GPU and brings up an NCCL process group, the TPU-native
model is SPMD: ONE process drives all local chips through a
``jax.sharding.Mesh``, and multi-host jobs call ``jax.distributed.initialize``
(pointed at the coordinator) before running the same program everywhere.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["launch"]


def launch(
    main_func,
    num_gpus_per_machine: int = 0,
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    args=(),
):
    """Run ``main_func(*args)`` under the appropriate distributed runtime.

    ``num_gpus_per_machine`` is accepted for CLI compatibility; device
    parallelism is expressed by the mesh, not by process count.
    """
    import jax

    world_size = num_machines
    if world_size > 1:
        coordinator = dist_url
        if coordinator and coordinator.startswith("tcp://"):
            coordinator = coordinator[len("tcp://") :]
        if coordinator in (None, "auto"):
            coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS", "127.0.0.1:12355")
        logger.info(
            "Initializing jax.distributed: coordinator=%s rank=%d world=%d",
            coordinator,
            machine_rank,
            world_size,
        )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=world_size,
            process_id=machine_rank,
        )
    logger.info("Devices visible to this process: %s", jax.devices())
    main_func(*args)
