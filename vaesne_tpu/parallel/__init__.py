"""SPMD parallelism: mesh construction and sharding placement helpers."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_state,
    replicated,
    resolve_mesh,
    shard_batch,
    shard_data_parallel,
)
from .tp import shard_params_tp, shard_state_tp, tensor_parallel_specs

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate_state",
    "replicated",
    "resolve_mesh",
    "shard_batch",
    "shard_data_parallel",
    "shard_params_tp",
    "shard_state_tp",
    "tensor_parallel_specs",
]
