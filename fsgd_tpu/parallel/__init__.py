from .mesh import (
    create_mesh,
    create_mesh_from_cfg,
    data_sharding,
    local_batch_size,
    replicated,
    shard_batch,
)
from .train_step import TrainState, create_train_state, make_eval_step, make_train_step

__all__ = [k for k in globals().keys() if not k.startswith("_")]
