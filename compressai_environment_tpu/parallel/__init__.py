from .mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "make_sharded_train_step",
    "shard_batch",
]
