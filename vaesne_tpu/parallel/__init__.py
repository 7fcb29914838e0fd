"""SPMD parallelism: mesh construction and sharding placement helpers."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
    shard_data_parallel,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate_state",
    "replicated",
    "shard_batch",
    "shard_data_parallel",
]
