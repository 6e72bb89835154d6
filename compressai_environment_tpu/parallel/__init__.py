from .distributed import (
    add_distributed_args,
    allgather_records,
    maybe_initialize,
    shard_work,
)
from .gather import gather_bitstreams, pack_strings, unpack_strings
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
    "gather_bitstreams",
    "pack_strings",
    "unpack_strings",
    "add_distributed_args",
    "maybe_initialize",
    "shard_work",
    "allgather_records",
]
